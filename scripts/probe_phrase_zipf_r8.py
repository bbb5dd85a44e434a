"""Round-8 probe (VERDICT r7 task 3): rarest-term anchoring for
phrase_search under a ZIPFIAN vocabulary.

The round-7 probe measured 30.9 s for 1,000 phrases at sf0.1 — but on
the driver fixture's 31-token near-uniform vocabulary (df spread
8.9k-9.2k), the documented worst case for offset-fanout anchoring and
a case where Lucene-style rarest-term anchoring wins nothing. Real
corpora are Zipfian: most phrase offsets are stopwords with huge df,
while almost every phrase contains at least one genuinely rare term.
This probe builds that corpus and measures the df-ratio win:

- corpus: 5,000 docs x 54 tokens, vocabulary 2,000 types drawn from a
  Zipf(s=1.1) distribution (deterministic seed) — top type df ~ 10k
  positions, median type df ~ 10;
- phrases: 1,000 real 2-4 token corpus windows (they occur, so the
  verify/aggregation stages do real work);
- both strategies run the same query sets: anchor="all" (the r7
  offset-fanout plan) vs anchor="rarest" (anchors only on each
  phrase's lowest-df term + one positional verify join).

Result table lands in PLANS.md. Expected shape: "all" pays the
stopword fan-out (candidate volume Σ_(phrase,i) df(token_i), dominated
by the Zipf head), "rarest" pays Σ df(rarest term) + query-term
postings once — the ratio is the head/tail df ratio.
"""

from __future__ import annotations

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from demy_spark.operators.retrieval import phrase_search  # noqa: E402
from demy_spark.session import get_spark  # noqa: E402

N_DOCS = 5_000
DOC_LEN = 54
VOCAB = 2_000
ZIPF_S = 1.1


def build_corpus() -> list[tuple[int, str]]:
    rng = random.Random(8)
    # inverse-CDF Zipf over a fixed vocabulary
    weights = [1.0 / (r + 1) ** ZIPF_S for r in range(VOCAB)]
    tot = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / tot
        cum.append(acc)

    def draw() -> int:
        u = rng.random()
        lo, hi = 0, VOCAB - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cum[mid] < u:
                lo = mid + 1
            else:
                hi = mid
        return lo

    return [
        (i, " ".join(f"w{draw()}" for _ in range(DOC_LEN)))
        for i in range(N_DOCS)
    ]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(
        "phrase_zipf_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=16,
    )
    corpus = build_corpus()
    docs = spark.createDataFrame(corpus, "doc_id long, text string").repartition(16)
    docs.persist().count()

    # real corpus windows as phrases (deterministic offsets)
    phrases = []
    for i in range(1000):
        toks = corpus[(i * 5) % N_DOCS][1].split()
        off, ln = (i * 7) % 40, 2 + (i % 3)
        phrases.append((i, " ".join(toks[off : off + ln])))

    # df profile of the phrase terms (head vs rarest)
    from collections import Counter

    df_pos = Counter()
    for _, text in corpus:
        df_pos.update(text.split())
    fanout = sum(df_pos[w] for _, p in phrases for w in p.split())
    rarest = sum(min(df_pos.get(w, 0) for w in p.split()) for _, p in phrases)
    print(
        f"offset-fanout volume={fanout:,} rarest-anchor volume={rarest:,} "
        f"ratio={fanout / max(rarest, 1):.1f}x"
    )

    for n in (100, 1000):
        q = spark.createDataFrame(phrases[:n], "qid long, qtext string")
        row = {}
        for mode in ("all", "rarest"):
            mk = lambda: phrase_search(  # noqa: E731
                docs, "doc_id", "text", q, "qid", "qtext", k=10, anchor=mode
            )
            force(mk())  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                force(mk())
                best = min(best, time.perf_counter() - t0)
            row[mode] = best
        print(
            f"n_phrases={n:5d}  all={row['all']:.3f}s  "
            f"rarest={row['rarest']:.3f}s  win={row['all'] / row['rarest']:.2f}x"
        )
    # sanity: identical results between strategies on the skewed corpus
    q = spark.createDataFrame(phrases[:200], "qid long, qtext string")
    a = set(
        map(
            tuple,
            phrase_search(
                docs, "doc_id", "text", q, "qid", "qtext", k=10, anchor="all"
            ).collect(),
        )
    )
    b = set(
        map(
            tuple,
            phrase_search(
                docs, "doc_id", "text", q, "qid", "qtext", k=10, anchor="rarest"
            ).collect(),
        )
    )
    assert a == b, f"strategy divergence: {len(a ^ b)} rows differ"
    print(f"strategy parity at 200 phrases: {len(a)} identical rows")
    spark.stop()


if __name__ == "__main__":
    main()
