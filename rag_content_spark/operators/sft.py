"""SFT / pretrain data shaping: chat-transcript parsing + validation and
fill-in-the-middle (FIM) transforms.

The two data-shaping steps an instruction-tuning / code-pretrain
pipeline runs after curation:

- **Chat transcripts** arrive as line-oriented ``Role: content`` text
  (one turn per line — the normalized interchange shape; multi-line
  turn bodies should be newline-escaped upstream). ``parse_chat_turns``
  explodes them to (dialog, turn_index, role, content) rows;
  ``validate_dialogs`` applies the standard SFT gate: starts with user,
  strict user/assistant alternation, ends with assistant, >= 2 turns,
  no empty turn bodies — emitting a per-dialog verdict plus the FIRST
  violation (the triage column a cleanup pass needs).
- **FIM** (Bavarian et al. 2022, arXiv:2207.14255): split a document
  into prefix/middle/suffix and re-serialize as
  ``<fim_prefix>P<fim_suffix>S<fim_middle>M`` (PSM order) so an
  autoregressive model learns infilling. Cut points here are TOKEN
  indices chosen by the deterministic 60-bit hash of the document id —
  reproducible across engines/runs (no RNG), and token-boundary cuts
  sidestep engine differences in character indexing.

Everything is narrow, shuffle-free column algebra (split / explode /
window-free aggregation by dialog id) — the shapes that scale linearly
with corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.functions.text import tokens

ROLES = ("system", "user", "assistant")

FIM_PREFIX = "<fim_prefix>"
FIM_SUFFIX = "<fim_suffix>"
FIM_MIDDLE = "<fim_middle>"


def parse_chat_turns(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, turn_index, role, content, n_tokens) — one row per
    ``Role: content`` line; lines without a role marker get role NULL
    (surfaced, not dropped: they are exactly what validation must see).
    """
    line = F.col("_line")
    role_raw = F.regexp_extract(line, r"^(\w+):", 1)
    has_role = F.lower(role_raw).isin(*ROLES)
    content = F.when(
        has_role, F.ltrim(F.expr("substring(_line, length(_role_raw) + 2)"))
    ).otherwise(line)
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "")
            ).alias("turn_index", "_line"),
        )
        .withColumn("_role_raw", role_raw)
        .select(
            id_col,
            "turn_index",
            F.when(has_role, F.lower(F.col("_role_raw"))).alias("role"),
            content.alias("content"),
            F.size(tokens(content)).cast("bigint").alias("n_tokens"),
        )
    )


def validate_dialogs(
    turns: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-dialog SFT gate over :func:`parse_chat_turns` output:
    (id, n_turns, n_user, n_assistant, valid, first_violation).

    Rules, in violation-priority order: ``unknown_role`` (a line with
    no/unknown marker), ``empty_turn``, ``too_short`` (< 2 turns after
    an optional leading system turn), ``bad_start`` (first non-system
    turn not user), ``bad_alternation`` (user/assistant must strictly
    alternate after the optional system prologue), ``bad_end`` (last
    turn not assistant). The checks are one aggregation over the turn
    rows — the alternation test compares each turn's role to the parity
    of its index among non-system turns, no window needed.
    """
    t = turns.select(F.col(id_col), "turn_index", "role", "content")
    agg = t.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("bigint")
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("bigint")
        .alias("n_assistant"),
        F.sum(F.when(F.col("role").isNull(), 1).otherwise(0)).alias("_n_norole"),
        F.sum(
            F.when(F.trim(F.col("content")) == "", 1).otherwise(0)
        ).alias("_n_empty"),
        F.sum(
            F.when(
                (F.col("role") == "system") & (F.col("turn_index") > 0), 1
            ).otherwise(0)
        ).alias("_n_latesys"),
        F.max(
            F.when(F.col("turn_index") == 0, F.col("role"))
        ).alias("_first_role"),
        F.max(
            F.when(F.col("turn_index") == 1, F.col("role"))
        ).alias("_second_role"),
        F.max_by(F.col("role"), F.col("turn_index")).alias("_last_role"),
        # base for the alternation parity: the first non-system turn
        # (null-role lines count — they are not a system prologue)
        F.min(
            F.when(
                (F.col("role") != "system") | F.col("role").isNull(),
                F.col("turn_index"),
            )
        ).alias("_base"),
    )
    # alternation: among user/assistant turns, role must be user on even
    # (turn_index - base) parity and assistant on odd — a conditional
    # sum after a broadcast-sized join on the per-dialog base
    alt = (
        t.alias("x")
        .join(
            agg.select(F.col(id_col).alias("_id"), "_base"),
            F.col(id_col) == F.col("_id"),
        )
        .filter(F.col("role").isin("user", "assistant"))
        .select(
            F.col(id_col),
            F.when(
                ((F.col("turn_index") - F.col("_base")) % 2 == 0)
                & (F.col("role") != "user"),
                1,
            )
            .when(
                ((F.col("turn_index") - F.col("_base")) % 2 == 1)
                & (F.col("role") != "assistant"),
                1,
            )
            .otherwise(0)
            .alias("_bad"),
        )
        .groupBy(id_col)
        .agg(F.sum("_bad").alias("_n_bad_alt"))
    )
    j = agg.join(alt, id_col, "left").withColumn(
        "_n_bad_alt", F.coalesce(F.col("_n_bad_alt"), F.lit(0))
    )
    n_conv = F.col("n_user") + F.col("n_assistant")
    first_violation = (
        F.when(F.col("_n_norole") > 0, "unknown_role")
        .when(F.col("_n_latesys") > 0, "unknown_role")
        .when(F.col("_n_empty") > 0, "empty_turn")
        .when(n_conv < 2, "too_short")
        .when(
            F.coalesce(
                F.when(F.col("_first_role") == "system", F.col("_second_role"))
                .otherwise(F.col("_first_role"))
                != F.lit("user"),
                F.lit(True),
            ),
            "bad_start",
        )
        .when(F.col("_n_bad_alt") > 0, "bad_alternation")
        .when(F.col("_last_role") != "assistant", "bad_end")
    )
    return j.select(
        id_col,
        n_conv.cast("bigint").alias("n_turns"),
        "n_user",
        "n_assistant",
        first_violation.isNull().alias("valid"),
        first_violation.alias("first_violation"),
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
    fim_pct: int = 50,
) -> DataFrame:
    """(id, fim_text, fim_applied, n_prefix, n_middle, n_suffix) — the
    PSM re-serialization with token-boundary cuts chosen by the
    document-id hash: cut1 in [1, n-2], cut2 in (cut1, n-1], both from
    independent salted hashes, so every engine/run picks the same
    spans. Documents shorter than ``min_tokens`` or hash-sampled out of
    ``fim_pct`` pass through unchanged (the standard FIM-rate knob)."""
    tok = tokens(F.col(text_col))
    n = F.size(tok)
    h_apply = stable_hash64(F.col(id_col).cast("string"), salt="fimr") % 100
    h1 = stable_hash64(F.col(id_col).cast("string"), salt="fim1")
    h2 = stable_hash64(F.col(id_col).cast("string"), salt="fim2")
    # cut1 in [1, n-2]; cut2 in [cut1+1, n-1] — both spans nonempty
    cut1 = (h1 % (n - 2)) + 1
    cut2 = cut1 + 1 + (h2 % (n - 1 - cut1))
    apply_fim = (n >= min_tokens) & (h_apply < fim_pct)
    joiner = " "
    prefix = F.array_join(F.slice(tok, 1, cut1), joiner)
    middle = F.array_join(F.slice(tok, cut1 + 1, cut2 - cut1), joiner)
    suffix = F.array_join(
        F.slice(tok, cut2 + 1, n - cut2), joiner
    )
    fim_text = F.concat(
        F.lit(FIM_PREFIX), prefix,
        F.lit(FIM_SUFFIX), suffix,
        F.lit(FIM_MIDDLE), middle,
    )
    return df.select(
        F.col(id_col),
        F.when(apply_fim, fim_text).otherwise(F.col(text_col)).alias("fim_text"),
        apply_fim.alias("fim_applied"),
        F.when(apply_fim, cut1).otherwise(F.lit(None)).cast("bigint").alias("n_prefix"),
        F.when(apply_fim, cut2 - cut1).otherwise(F.lit(None)).cast("bigint").alias("n_middle"),
        F.when(apply_fim, n - cut2).otherwise(F.lit(None)).cast("bigint").alias("n_suffix"),
    )
