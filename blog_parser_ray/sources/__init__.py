"""Sources: schema-checked readers and the deterministic partition planner."""
