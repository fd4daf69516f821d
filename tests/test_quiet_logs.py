"""Pin _quiet's benign-schema-noise filter in both directions (r3 verdict #7).

The two Ray 2.49 executor warnings ("Failed to hash the schemas",
"RefBundle with a different schema ... new schema: <empty>") are emitted by
Ray internals on sort's schema-less empty partitions — no user-code fix
exists (see blog_parser_ray/_quiet.py for the measured evidence).  These
tests assert (a) the filter drops exactly the benign shapes, (b) a REAL
typed→typed divergence still passes, and (c) a previously-noisy pipeline
(dedup_components: 8 divergence + 2 hash warnings before the fix) now runs
with a clean `ray.data` log.
"""

from __future__ import annotations

import logging

import blog_parser_ray  # noqa: F401  (installs the filter on import)
from blog_parser_ray._quiet import BenignSchemaNoiseFilter, _LOGGER_NAMES


def _rec(msg: str) -> logging.LogRecord:
    return logging.LogRecord(
        name=_LOGGER_NAMES[0], level=logging.WARNING, pathname=__file__,
        lineno=1, msg=msg, args=(), exc_info=None)


def test_filter_drops_benign_shapes():
    f = BenignSchemaNoiseFilter()
    assert not f.filter(_rec(
        "Failed to hash the schemas (for deduplication): unhashable type: 'dict'"))
    assert not f.filter(_rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64\nb: int64, new schema: . "
        "This may lead to unexpected behavior."))
    assert not f.filter(_rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: PandasBlockSchema(names=['a', 'b'], "
        "types=[dtype('int64'), dtype('int64')]), new schema: . "
        "This may lead to unexpected behavior."))
    assert not f.filter(_rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: "
        "PandasBlockSchema(names=[], types=[]). "
        "This may lead to unexpected behavior."))


def test_filter_keeps_real_divergence_and_other_logs():
    f = BenignSchemaNoiseFilter()
    # typed -> DIFFERENT typed: the real regression signal must survive
    assert f.filter(_rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: a: double. "
        "This may lead to unexpected behavior."))
    assert f.filter(_rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: "
        "PandasBlockSchema(names=['a'], types=[dtype('float64')]). "
        "This may lead to unexpected behavior."))
    assert f.filter(_rec("some unrelated ray.data warning"))


def test_filter_installed_on_import():
    for name in _LOGGER_NAMES:
        lg = logging.getLogger(name)
        assert any(isinstance(flt, BenignSchemaNoiseFilter) for flt in lg.filters)


def test_noisy_pipeline_logs_clean():
    """dedup_components produced 10 warnings at sf0.001 before the fix."""
    from blog_parser_ray.pipelines.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"

    captured: list[str] = []

    class _Capture(logging.Handler):
        def emit(self, record: logging.LogRecord) -> None:
            captured.append(record.getMessage())

    h = _Capture(level=logging.WARNING)
    root = logging.getLogger("ray.data")
    root.addHandler(h)
    try:
        res = QUERIES["dedup_components"](str(sf_dir))
        n = res.count() if hasattr(res, "count") else len(res)
        assert n > 0
    finally:
        root.removeHandler(h)

    bad = [m for m in captured
           if "Failed to hash the schemas" in m
           or "RefBundle with a different schema" in m]
    assert bad == [], bad
