"""Unit tests for the beam-search POS tagger."""

from __future__ import annotations

from pyspark.sql import functions as F

from demy_spark.postag import beam_tag_tokens, pos_tag

LEXICON = {
    "the": {"DET": 1.0},
    "can": {"NOUN": 0.3, "VERB": 0.2, "AUX": 0.5},
    "rusts": {"VERB": 1.0},
    "fly": {"NOUN": 0.4, "VERB": 0.6},
    "i": {"PRON": 1.0},
}

TRANSITIONS = {
    ("^", "DET"): 0.6,
    ("^", "PRON"): 0.4,
    ("DET", "NOUN"): 0.9,
    ("NOUN", "VERB"): 0.8,
    ("PRON", "AUX"): 0.7,
    ("AUX", "VERB"): 0.9,
}


def test_beam_disambiguates_by_context():
    # after a determiner, 'can' is a noun; after a pronoun, an auxiliary
    assert beam_tag_tokens(["the", "can", "rusts"], LEXICON, TRANSITIONS) == [
        "DET",
        "NOUN",
        "VERB",
    ]
    assert beam_tag_tokens(["i", "can", "fly"], LEXICON, TRANSITIONS) == [
        "PRON",
        "AUX",
        "VERB",
    ]


def test_beam_unknown_words_get_unk():
    assert beam_tag_tokens(["the", "xyzzy"], LEXICON, TRANSITIONS) == ["DET", "UNK"]


def test_pos_tag_dataframe_and_df_lexicon(spark):
    lex_df = spark.createDataFrame(
        [(w, t, wt) for w, tags in LEXICON.items() for t, wt in tags.items()],
        ["word", "tag", "weight"],
    )
    trans_df = spark.createDataFrame(
        [(p, t, w) for (p, t), w in TRANSITIONS.items()],
        ["prev_tag", "tag", "weight"],
    )
    df = spark.createDataFrame(
        [(1, ["the", "can", "rusts"]), (2, ["i", "can", "fly"])], ["id", "toks"]
    )
    out = pos_tag(df, "toks", lex_df, trans_df)
    got = {r["id"]: r["tags"] for r in out.collect()}
    assert got[1] == ["DET", "NOUN", "VERB"]
    assert got[2] == ["PRON", "AUX", "VERB"]


def test_greedy_matches_beam_width_one(spark):
    from demy_spark.postag import pos_tag_greedy

    df = spark.createDataFrame(
        [
            (1, ["the", "can", "rusts"]),
            (2, ["i", "can", "fly"]),
            (3, ["the", "xyzzy", "can"]),
            (4, []),
        ],
        "id long, toks array<string>",
    )
    greedy = {
        r["id"]: r["tags"] for r in pos_tag_greedy(df, "toks", LEXICON, TRANSITIONS).collect()
    }
    beam1 = {
        r["id"]: r["tags"]
        for r in pos_tag(df, "toks", LEXICON, TRANSITIONS, beam_size=1).collect()
    }
    assert greedy == beam1
    assert greedy[4] == []
    assert greedy[3][1] == "UNK"
