"""Static schemas and token-space constants for the flagship pipeline.

The flagship input table (FIXTURES.md §1, BASELINE.json input_hint) is::

    doc_id : string        -- unique, grok-parseable "{source}/{yyyy-mm-dd}/{seq}"
    tokens : list<int32>   -- [BOS, ...vocab ids..., EOS], SEC as section delimiter
    n_tok  : int32         -- == len(tokens) on valid rows
    source : string        -- routing/enrich key (Zipf-skewed at scale)

Every stage publishes its output schema statically (SURVEY.md §1.2) — nothing
relies on inference. The per-row invariant carried through every stage is
byte-for-byte equality of ``tokens`` vs the input (BASELINE.json input_hint).
"""

from __future__ import annotations

import pyarrow as pa

# ---- token space --------------------------------------------------------------
BOS = 0  # beginning-of-sequence
EOS = 1  # end-of-sequence
SEC = 2  # section delimiter (reference: HTML header boundary → section split)
N_SPECIALS = 3

# The 31-word vocabulary observable in the driver `documents.text` corpus
# (FIXTURES.md §1; identical across sf0.001/0.01/0.1). id(word) = N_SPECIALS + index.
VOCAB_WORDS: tuple[str, ...] = tuple(
    sorted(
        """a agg batch big column customer data dup fast filter group hash join key
        line merge order part query row scan slow small sort spark stream table the
        value vector window""".split()
    )
)
VOCAB: dict[str, int] = {w: N_SPECIALS + i for i, w in enumerate(VOCAB_WORDS)}
INV_VOCAB: dict[int, str] = {BOS: "<bos>", EOS: "<eos>", SEC: "<sec>"}
INV_VOCAB.update({v: k for k, v in VOCAB.items()})
BRIDGE_VOCAB_SIZE = N_SPECIALS + len(VOCAB_WORDS)  # 34

# Default vocab bound for the synthetic corpus (synth.py); parse validates
# 0 <= id < vocab_size.
DEFAULT_VOCAB_SIZE = 256
MAX_TOKENS = 4096  # oversized threshold (FIXTURES.md §3)

# ---- parse classes (P7 precedence order, first match wins) --------------------
# SURVEY.md §2.2 P7, extended with `len_mismatch` for n_tok != len(tokens)
# (FIXTURES.md §3 requires the case; it gets its own class).
CLASS_MALFORMED_ID = "malformed_id"
CLASS_EMPTY = "empty"
CLASS_LEN_MISMATCH = "len_mismatch"
CLASS_NO_BOS = "no_bos"
CLASS_BAD_TOKEN = "bad_token"
CLASS_OVERSIZED = "oversized"
CLASS_OK = "ok"
PARSE_CLASSES: tuple[str, ...] = (
    CLASS_MALFORMED_ID,
    CLASS_EMPTY,
    CLASS_LEN_MISMATCH,
    CLASS_NO_BOS,
    CLASS_BAD_TOKEN,
    CLASS_OVERSIZED,
    CLASS_OK,
)

# ---- arrow schemas ------------------------------------------------------------
TOKENS_TYPE = pa.list_(pa.int32())
PARSE_FIELDS_TYPE = pa.struct(
    [("src", pa.string()), ("date", pa.string()), ("seq", pa.string())]
)

SEQUENCES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", TOKENS_TYPE),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

PARSED_SCHEMA = pa.schema(
    list(SEQUENCES_SCHEMA)
    + [
        ("parse_class", pa.string()),
        ("parse_fields", PARSE_FIELDS_TYPE),
        ("n_sections", pa.int32()),
        ("tok_len", pa.int32()),  # materialized len(tokens), for cheap aggs
    ]
)

ENRICHED_SCHEMA = pa.schema(
    list(PARSED_SCHEMA)
    + [
        ("meta_tenant", pa.string()),
        ("meta_region", pa.string()),
        ("meta_priority", pa.int32()),
        ("sink_hint", pa.string()),
    ]
)

ROUTED_SCHEMA = pa.schema(list(ENRICHED_SCHEMA) + [("sink", pa.string())])

DIM_SOURCE_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("meta_tenant", pa.string()),
        ("meta_region", pa.string()),
        ("meta_priority", pa.int32()),
        ("sink_hint", pa.string()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int64()),
        ("input_fragment", pa.string()),
        ("sink", pa.string()),
        ("row_count", pa.int64()),
        ("token_count", pa.int64()),
        ("bytes_written", pa.int64()),
        ("attempt", pa.int32()),
        ("wall_s", pa.float64()),
    ]
)

REGIONS: tuple[str, ...] = ("amer", "emea", "apac", "latam", "anz")

# doc_id grok pattern (SURVEY.md §2.2 P1): our grok dialect = named-group regex.
GROK_DOC_ID = (
    r"^(?P<src>[a-z0-9_]+)/"
    r"(?P<date>\d{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12][0-9]|3[01]))/"
    r"(?P<seq>\d+)$"
)


def assert_sequences_schema(schema: pa.Schema) -> None:
    """Assert the four flagship columns exist with the contracted types (S1)."""
    for name in SEQUENCES_SCHEMA.names:
        if schema.field(name).type != SEQUENCES_SCHEMA.field(name).type:
            raise TypeError(
                f"sequences column {name!r}: expected "
                f"{SEQUENCES_SCHEMA.field(name).type}, got {schema.field(name).type}"
            )
