"""Targeted suppression of two benign Ray Data executor log warnings.

Round-3 verdict item #7 asked for the flagship bench tail to be free of

- ``Failed to hash the schemas (for deduplication): unhashable type: ...``
- ``Operator produced a RefBundle with a different schema ... new schema: .``

The verdict's preferred fix — "emit typed empty blocks from the map_groups /
map_batches sites" — is not reachable from user code in Ray 2.49, measured
this round:

- ``sort()`` (the first half of every ``map_groups``) emits **schema-less
  empty blocks** for empty range partitions.  A downstream
  ``map_batches(fn, batch_size=None)`` never calls ``fn`` on those blocks —
  an instrumented UDF over a sorted 10-row dataset saw only the non-empty
  blocks ``{4: 1, 3: 2}`` while the divergence warning still fired on both
  the sort and the map operator.  The empty bundles are forwarded around the
  UDF, so no user wrapper can type them.
- The "Failed to hash" advisory fires inside
  ``transform_pyarrow.unify_schemas`` when the ``set(schemas)`` early-exit
  optimization hits an unhashable schema object (driver-side
  ``Dataset.schema()`` resolution over mixed pandas/arrow/empty bundles).
  The code path then proceeds to the full unify — the warning documents a
  missed fast path, not a correctness event.

Both messages are therefore noise *in exactly these two shapes*, and this
module drops only those shapes:

- the hash advisory is always dropped (it is advisory by construction);
- a divergence warning is dropped only when the NEW schema is the
  schema-less empty block (rendered as an empty string / ``None`` / an
  empty ``PandasBlockSchema``).  A typed→different-typed divergence — the
  real regression signal the verdict wants preserved — still passes.

Filters attach to the two ORIGINATING module loggers (records are filtered
at their source logger before propagation), so Ray's own handler
configuration is untouched.  ``tests/test_quiet_logs.py`` pins both
directions: benign shapes dropped, real divergence kept.
"""

from __future__ import annotations

import logging
import re

_HASH_NOISE = "Failed to hash the schemas (for deduplication)"
_DIVERGE = "Operator produced a RefBundle with a different schema"

# The f-string in streaming_executor_state.py renders the bundle schema with
# str(); a schema-less empty block shows up as "", "None", or an empty
# PandasBlockSchema.
_NEW_SCHEMA_RE = re.compile(r"new schema: (?P<new>.*?)\. This may lead", re.DOTALL)

_LOGGER_NAMES = (
    "ray.data._internal.execution.streaming_executor_state",
    "ray.data._internal.arrow_ops.transform_pyarrow",
)


def _is_benign_divergence(msg: str) -> bool:
    m = _NEW_SCHEMA_RE.search(msg)
    if m is None:
        return False
    new = m.group("new").strip()
    return (
        new == ""
        or new == "None"
        or new.startswith("PandasBlockSchema(names=[]")
    )


class BenignSchemaNoiseFilter(logging.Filter):
    """Drop the two benign executor-schema messages; pass everything else."""

    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        if _HASH_NOISE in msg:
            return False
        if _DIVERGE in msg and _is_benign_divergence(msg):
            return False
        return True


_installed = False


def install() -> None:
    """Attach the filter to the two originating Ray loggers (idempotent).

    Imports ``ray.data`` first so Ray's own logging configuration has
    already run — logger objects are process singletons, so the filter
    survives it either way, but the explicit ordering removes the doubt.
    """
    global _installed
    if _installed:
        return
    import ray.data  # noqa: F401  (ordering: let Ray configure logging first)

    flt = BenignSchemaNoiseFilter()
    for name in _LOGGER_NAMES:
        lg = logging.getLogger(name)
        if not any(isinstance(f, BenignSchemaNoiseFilter) for f in lg.filters):
            lg.addFilter(flt)
    _installed = True
