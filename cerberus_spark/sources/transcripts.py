"""Deterministic, fully-distributed synthetic transcript generator.

Produces the north-rule input shape
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` entirely from ``spark.range`` + columnar expressions —
no driver-side data, no randomness source: every cell is a closed-form
function of (conv_num, turn_idx), so expected violations are exactly
computable by the pure-Python twin ``expected_violations`` below (the
pytest golden oracle), and the generated table is identical at any
parallelism.

Injected pathologies (all at deterministic coordinates):
- out-of-domain roles        (``allowed`` violations)
- null / empty / oversize text (``required`` / ``empty`` violations)
- tool set on non-tool turns (``dependencies`` violations)
- dangling tool references   (referential violations)
- duplicated (conv_id, turn_idx) rows (uniqueness violations)
- hot conversations with 100x turns (skew fixture)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa",
]
VALID_TOOLS = ["search", "calculator", "python", "browser", "sql"]
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z

# violation-injection moduli (closed-form coordinates)
MOD_HOT = 997        # conv_num % MOD_HOT == 0 -> hot conversation (100x turns)
MOD_ROLE = 611       # (conv*31 + turn) % MOD_ROLE == 0 -> role='critic'
MOD_NULL_TEXT = 509  # (conv*17 + turn) % MOD_NULL_TEXT == 0 -> text null
MOD_EMPTY_TEXT = 503  # ... == 1 -> text ''
MOD_BAD_TOOL = 97   # tool turn with (conv*13 + turn) % MOD_BAD_TOOL == 0 -> ghost tool
MOD_STRAY_TOOL = 479  # non-tool turn with (conv*7 + turn) % MOD_STRAY_TOOL == 0 -> stray tool
MOD_DUP = 499        # conv_num % MOD_DUP == 3 -> turn 1 duplicated
TOOL_TURN = 11       # (conv + turn) % TOOL_TURN == 3 and turn>0 -> role='tool'
HOT_FACTOR = 100


def _n_turns(conv_num: F.Column) -> F.Column:
    base = 3 + F.pmod(conv_num, F.lit(8))
    return F.when(F.pmod(conv_num, F.lit(MOD_HOT)) == 0, base * HOT_FACTOR).otherwise(base)


def generate_transcripts(spark: SparkSession, n_convs: int, partitions: int | None = None) -> DataFrame:
    """~6.5 rows/conv on average (plus hot-conv tail)."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    conv = (
        spark.range(0, n_convs, numPartitions=partitions)
        .withColumnRenamed("id", "conv_num")
        .withColumn("n_turns", _n_turns(F.col("conv_num")))
    )
    t = conv.select(
        "conv_num",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    c, i = F.col("conv_num"), F.col("turn_idx")

    role = (
        F.when(i == 0, "system")
        .when((i > 0) & (F.pmod(c + i, F.lit(TOOL_TURN)) == 3), "tool")
        .when(F.pmod(c * 31 + i, F.lit(MOD_ROLE)) == 0, "critic")  # out-of-domain
        .when(F.pmod(i, F.lit(2)) == 1, "user")
        .otherwise("assistant")
    )

    n_words = 5 + F.pmod(c + i * 3, F.lit(40))
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    text_body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda k: F.element_at(words_arr, (F.pmod(c * 131 + i * 17 + k * 7, F.lit(len(WORDS))) + 1).cast("int")),
        ),
        " ",
    )
    text = (
        F.when(F.pmod(c * 17 + i, F.lit(MOD_NULL_TEXT)) == 0, F.lit(None).cast("string"))
        .when(F.pmod(c * 17 + i, F.lit(MOD_EMPTY_TEXT)) == 1, F.lit(""))
        .otherwise(text_body)
    )

    tools_arr = F.array(*[F.lit(x) for x in VALID_TOOLS])
    is_tool_turn = (i > 0) & (F.pmod(c + i, F.lit(TOOL_TURN)) == 3)
    tool = (
        F.when(
            is_tool_turn & (F.pmod(c * 13 + i, F.lit(MOD_BAD_TOOL)) == 0),
            F.lit("ghost_tool"),
        )
        .when(is_tool_turn, F.element_at(tools_arr, (F.pmod(c + i, F.lit(len(VALID_TOOLS))) + 1).cast("int")))
        .when(
            ~is_tool_turn & (F.pmod(c * 7 + i, F.lit(MOD_STRAY_TOOL)) == 0) & (i > 0),
            F.element_at(tools_arr, (F.pmod(c, F.lit(len(VALID_TOOLS))) + 1).cast("int")),
        )
        .otherwise(F.lit(None).cast("string"))
    )

    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + c * 60 + i * 7)

    base = t.select(
        F.format_string("conv-%08d", c).alias("conv_id"),
        i.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
    # uniqueness violations: duplicate turn 1 of every conv ≡ 3 (mod MOD_DUP)
    dups = base.filter(
        (F.substring(F.col("conv_id"), 6, 8).cast("long") % MOD_DUP == 3)
        & (F.col("turn_idx") == 1)
    )
    return base.unionAll(dups)


# ---------------------------------------------------------------------------
# pure-Python twin: closed-form expected rows/violations for the golden
# e2e tests (small n only — this is the oracle, not an engine path)
# ---------------------------------------------------------------------------

def py_n_turns(conv_num: int) -> int:
    base = 3 + conv_num % 8
    return base * HOT_FACTOR if conv_num % MOD_HOT == 0 else base


def py_rows(n_convs: int) -> list[dict]:
    from datetime import datetime, timezone

    rows = []
    for c in range(n_convs):
        for i in range(py_n_turns(c)):
            if i == 0:
                role = "system"
            elif i > 0 and (c + i) % TOOL_TURN == 3:
                role = "tool"
            elif (c * 31 + i) % MOD_ROLE == 0:
                role = "critic"
            elif i % 2 == 1:
                role = "user"
            else:
                role = "assistant"
            n_words = 5 + (c + i * 3) % 40
            body = " ".join(
                WORDS[(c * 131 + i * 17 + k * 7) % len(WORDS)] for k in range(1, n_words + 1)
            )
            if (c * 17 + i) % MOD_NULL_TEXT == 0:
                text = None
            elif (c * 17 + i) % MOD_EMPTY_TEXT == 1:
                text = ""
            else:
                text = body
            is_tool_turn = i > 0 and (c + i) % TOOL_TURN == 3
            if is_tool_turn and (c * 13 + i) % MOD_BAD_TOOL == 0:
                tool = "ghost_tool"
            elif is_tool_turn:
                tool = VALID_TOOLS[(c + i) % len(VALID_TOOLS)]
            elif (not is_tool_turn) and (c * 7 + i) % MOD_STRAY_TOOL == 0 and i > 0:
                tool = VALID_TOOLS[c % len(VALID_TOOLS)]
            else:
                tool = None
            ts = datetime.fromtimestamp(BASE_EPOCH + c * 60 + i * 7, tz=timezone.utc)
            rows.append(
                {
                    "conv_id": f"conv-{c:08d}",
                    "turn_idx": i,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                    "_conv_num": c,
                }
            )
            if i == 1 and c % MOD_DUP == 3:
                rows.append(dict(rows[-1]))
    return rows
