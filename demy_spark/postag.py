"""POS tagging: lexicon emission scores + tag-transition likelihoods,
decoded per sentence with a beam search.

Parity targets:
- ``GramTag`` (text/GramTag.scala:83-344): lexicon-driven tag
  disambiguation with transition likelihoods and left/right sweeps.
- ``PTree`` beam search (search/PTree.scala:6-68).

Design: the lexicon (word → {tag: weight}) and the transition matrix
are driver-side dicts broadcast into an Arrow-batched pandas UDF; the
beam decode runs per row over the token array. This is the survey's
prescribed mapping (§2.10: "broadcast lexicon + pandas UDF; beam
search in numpy") — tagging is inherently per-sentence sequential, so
it belongs in a vectorized UDF, not in SQL operators.

Scale notes: state per executor = the broadcast lexicon (dictionary-
sized); each batch is tagged independently — embarrassingly parallel
over documents, no shuffle at all.
"""

from __future__ import annotations

import math

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNKNOWN_TAG = "UNK"


def beam_tag_tokens(
    tokens: list[str],
    lexicon: dict[str, dict[str, float]],
    transitions: dict[tuple[str, str], float],
    *,
    beam_size: int = 4,
    default_transition: float = 0.01,
) -> list[str]:
    """Beam decode one token sequence. Scores are log-additive:
    emission weight from the lexicon (unknown words get UNKNOWN_TAG),
    transition weight from the (prev, cur) matrix."""
    beams: list[tuple[float, list[str]]] = [(0.0, [])]
    for tok in tokens:
        options = lexicon.get(tok.lower(), {UNKNOWN_TAG: 1.0})
        nxt: list[tuple[float, list[str]]] = []
        for score, tags in beams:
            prev = tags[-1] if tags else "^"
            for tag, emit in options.items():
                trans = transitions.get((prev, tag), default_transition)
                nxt.append(
                    (score + math.log(emit) + math.log(trans), tags + [tag])
                )
        nxt.sort(key=lambda b: (-b[0], b[1]))
        beams = nxt[:beam_size]
    return beams[0][1] if beams else []


def make_pos_tagger(
    spark,
    lexicon: DataFrame | dict[str, dict[str, float]],
    transitions: DataFrame | dict[tuple[str, str], float],
    *,
    beam_size: int = 4,
):
    """Build a Column function tokens → array<string> tags.

    ``lexicon`` as a DataFrame needs (word, tag, weight) columns;
    ``transitions`` needs (prev_tag, tag, weight). Both are collected
    (dictionary-sized by construction) and broadcast."""
    from pyspark.sql.functions import pandas_udf

    if isinstance(lexicon, DataFrame):
        lex: dict[str, dict[str, float]] = {}
        for r in lexicon.collect():
            lex.setdefault(r["word"].lower(), {})[r["tag"]] = float(r["weight"])
    else:
        lex = lexicon
    if isinstance(transitions, DataFrame):
        trans = {
            (r["prev_tag"], r["tag"]): float(r["weight"]) for r in transitions.collect()
        }
    else:
        trans = transitions

    b_lex = spark.sparkContext.broadcast(lex)
    b_trans = spark.sparkContext.broadcast(trans)

    @pandas_udf("array<string>")
    def tag(tokens: pd.Series) -> pd.Series:
        lex_v, trans_v = b_lex.value, b_trans.value
        # NULL token arrays (NULL text upstream) tag to [], not crash
        return tokens.apply(
            lambda toks: beam_tag_tokens(
                list(toks) if toks is not None else [],
                lex_v,
                trans_v,
                beam_size=beam_size,
            )
        )

    return tag


def pos_tag(
    df: DataFrame,
    tokens_col: str,
    lexicon,
    transitions,
    *,
    out_col: str = "tags",
    beam_size: int = 4,
) -> DataFrame:
    """Tag a token-array column; appends ``out_col`` array<string>."""
    tagger = make_pos_tagger(df.sparkSession, lexicon, transitions, beam_size=beam_size)
    return df.withColumn(out_col, tagger(F.col(tokens_col)))


def greedy_decision_table(
    lexicon: dict[str, dict[str, float]],
    transitions: dict[tuple[str, str], float],
    *,
    default_transition: float = 0.01,
) -> dict[str, str]:
    """Precompute the greedy decode as a (prev_tag, word) → tag table.

    With beam width 1 the running score is common to every option at a
    step, so the choice depends ONLY on the previous tag and the
    current word: argmax over emission × transition, ties to the
    lexicographically smallest tag. The whole decode collapses to a
    dictionary-sized lookup table — which is what lets the decode run
    JVM-side (and lets a SQL oracle replay it exactly)."""
    tags = sorted({t for opts in lexicon.values() for t in opts})
    table: dict[str, str] = {}
    for prev in tags + [UNKNOWN_TAG, "^"]:
        for word, options in lexicon.items():
            best = min(
                options.items(),
                key=lambda kv: (
                    -(kv[1] * transitions.get((prev, kv[0]), default_transition)),
                    kv[0],
                ),
            )
            table[f"{prev}|{word}"] = best[0]
    return table


def pos_tag_greedy(
    df: DataFrame,
    tokens_col: str,
    lexicon: dict[str, dict[str, float]],
    transitions: dict[tuple[str, str], float],
    *,
    out_col: str = "tags",
    default_transition: float = 0.01,
) -> DataFrame:
    """Greedy (beam=1) POS tagging with NO Python in the hot path.

    The decision table becomes a map literal and the sequential decode
    an ``F.aggregate`` fold over the token array — whole-stage codegen
    executes the walk, vs. the beam tagger's Arrow round-trip. Unknown
    words tag as UNK (``try_element_at`` keeps ANSI mode safe). Scale
    shape: zero shuffle, zero UDF; the table is O(|tags|·|lexicon|)
    literals in the plan."""
    table = greedy_decision_table(
        lexicon, transitions, default_transition=default_transition
    )
    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(table.items()) for x in kv]
    )
    def step(acc: Column, tok: Column) -> Column:
        chosen = F.coalesce(
            F.try_element_at(mapping, F.concat(acc["prev"], F.lit("|"), tok)),
            F.lit(UNKNOWN_TAG),
        )
        return F.struct(
            chosen.alias("prev"),
            F.concat(acc["tags"], F.array(chosen)).alias("tags"),
        )

    init = F.struct(
        F.lit("^").alias("prev"),
        F.expr("array()").cast("array<string>").alias("tags"),
    )
    return df.withColumn(
        out_col,
        F.aggregate(F.col(tokens_col), init, step, lambda acc: acc["tags"]),
    )
