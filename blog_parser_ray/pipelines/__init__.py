"""Pipelines: the flagship Dataset chain and the queries()/oracle_sql() registry."""
