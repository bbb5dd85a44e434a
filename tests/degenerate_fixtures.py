"""Shared pathological-fixture builders — ONE degenerate twin per
catalog table, schema-exact vs the driver fixtures.

The single-table degenerate fuzz suites (documents / embeddings /
events) and the multi-table suite (VERDICT r7 task 2: q138's
zero-norm bug escaped both single-table suites because its oracle
touches two tables) all build their parquet from here, so a new edge
case added for one suite is exercised by every suite.

Degeneracy checklist per table: NULL and empty strings, whitespace /
NBSP-only text, astral chars, zero and negative numerics, NULL
numerics and timestamps, same-instant ties, dangling AND NULL foreign
keys, duplicate business keys — plus enough normal rows that joins,
group-bys and samplers have material.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq

EMB_DIM = 64


def _ts(s: str | None) -> datetime.datetime | None:
    return None if s is None else datetime.datetime.fromisoformat(s)


def documents_rows() -> list[tuple]:
    return [
        # (doc_id, text, lang, source) — degenerate text first
        (1, "", "en", "src1"),
        (2, "   ", "en", "src2"),
        (3, None, "fr", "src3"),
        (4, "x", "en", "src1"),
        (5, " ", "de", "src2"),  # NBSP-only (the Zs trim edge)
        (6, "\U0001f600 astral \U0001f600 astral chars", "en", "src3"),
        # normal rows so group-bys / samples / indexes have material
        (7, "the quick brown fox jumps over the lazy dog near the barn", "en", "src1"),
        (8, "spark query engines shuffle columnar partitions across nodes", "en", "src2"),
        (9, "the quick brown fox jumps over the lazy dog near the barn", "en", "src3"),
        (10, "hash join table window agg stream slow scan filter vector", "en", "src1"),
        (24, "one two three four five six seven eight nine ten", "en", "src2"),
        (31, "lorem ipsum dolor sit amet consectetur adipiscing elit", "en", "src3"),
        (97, "customer order line part shipment invoice ledger account", "en", "src1"),
        (194, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src2"),
        # NULL business key (r8 fixture audit): a NULL doc_id must
        # group as one SQL NULL group and match NOTHING in joins
        (None, "null id document with enough words to score", "en", "src3"),
    ]


def write_documents(d: str) -> None:
    rows = documents_rows()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) if r[1] is not None else 0 for r in rows],
                    pa.int64(),
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def emb_vec(seed: int) -> list[float]:
    # deterministic non-trivial vector, no RNG
    return [float(((seed * 31 + d * 7) % 11) - 5) for d in range(EMB_DIM)]


def embeddings_rows() -> list[tuple]:
    rows = []
    # degenerate head: zero vector, duplicates of it, near-duplicate,
    # all-negative, tiny-magnitude
    rows.append((0, [0.0] * EMB_DIM, 0))              # THE zero vector
    rows.append((1, [0.0] * EMB_DIM, 1))              # duplicate zero vector
    rows.append((2, emb_vec(2), 2))
    rows.append((3, emb_vec(2), 3))                   # exact dup of 2, other label
    near = emb_vec(2)
    near[0] += 0.25
    rows.append((4, near, 4))                         # near-dup of 2
    rows.append((5, [-x for x in emb_vec(2)], 5))     # opposite of 2
    rows.append((6, [1e-9] * EMB_DIM, 6))             # tiny magnitude
    # NULL vector and NULL element (the checklist's "NULL numerics" —
    # absent until the r8 fixture audit): real corpora carry embedding
    # gaps; both sides must treat them as SQL NULL, not zeros
    rows.append((200, None, 0))
    null_elem = emb_vec(5)
    null_elem[3] = None
    rows.append((201, null_elem, 1))
    # normal tail: 6 per label — every label-seeded operator has mass
    # and the total (67) clears q47's pool_size=64 replay contract
    i = 7
    for lab in range(10):
        for _ in range(6):
            rows.append((i, emb_vec(i), lab))
            i += 1
    return rows


def write_embeddings(d: str) -> None:
    rows = embeddings_rows()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


def events_rows() -> list[tuple]:
    T = "2024-03-01 "
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        # same-instant triple for one user (ordering tie-breaks)
        (1, T + "00:00:00", 1, "click", 1.0, '{"k": "a"}'),
        (2, T + "00:00:00", 1, "view", 2.0, '{"k": "b", "n": 3}'),
        (3, T + "00:00:00", 1, "purchase", 0.0, "{}"),
        # exact hour boundary + one microsecond before it
        (4, T + "00:59:59.999999", 1, "click", -5.0, None),
        (5, T + "01:00:00", 1, "click", 5.0, "not json"),
        # a >30min session gap for the same user
        (6, T + "02:00:00", 1, "view", 1e9, '{"a": {"b": 1}}'),
        # second user: NULL value, NULL event_type, empty-string props
        (7, T + "00:30:00", 2, "signup", None, ""),
        (8, T + "00:45:00", 2, None, 4.0, '{"k": "c"}'),
        (9, T + "23:59:59.999999", 2, "error", 7.0, "[1, 2]"),
        # third user: lone event at epoch-style midnight
        (10, T + "00:00:00", 3, "error", 0.5, '{"k": "a"}'),
        # NULL and dangling foreign keys (the per-table checklist —
        # a NULL user_id must match NOTHING in an equi/as-of join
        # even against a NULL-custkey orders row, and a user with no
        # orders at all exercises the truly-unmatched path; their
        # absence hid the asof_join NULL-key divergence, r8 review)
        (41, T + "04:00:00", None, "click", 1.5, "{}"),
        (42, T + "04:30:00", 999_999, "view", 2.5, '{"k": "z"}'),
        # NULL timestamp (the checklist's "NULL ... timestamps" —
        # absent until the r8 fixture audit): must group/window/match
        # as SQL NULL on both sides, never as epoch or NaT-as-zero
        (43, None, 2, "click", 3.5, "{}"),
        # 30min + 1 microsecond after user 3's lone 00:00:00 event: a
        # whole-second gap cast truncates 1800.000001 -> 1800 and
        # GLUES where interval comparison splits (r8 review, q13)
        (44, T + "00:30:00.000001", 3, "view", 1.0, "{}"),
    ]
    # skew tail: one user dominating (salted-agg path does real work)
    for i in range(11, 41):
        rows.append(
            (
                i,
                T + f"03:{i % 60:02d}:{(i * 7) % 60:02d}",
                1,
                ["click", "view", "purchase", "error", "signup"][i % 5],
                float(i % 7),
                f'{{"k": "v{i % 3}"}}',
            )
        )
    return rows


def write_events(d: str) -> None:
    rows = events_rows()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


def write_region(d: str) -> None:
    rows = [
        (0, "AFRICA"),
        (1, "AMERICA"),
        (2, ""),          # empty name
        (3, None),        # NULL name
        (4, "ASIA"),
        (9, "ORPHAN \U0001f30d REGION"),  # no nation points here
    ]
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([r[0] for r in rows], pa.int32()),
                "r_name": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "region.parquet"),
    )


def write_nation(d: str) -> None:
    rows = [
        # (n_nationkey, n_name, n_regionkey)
        (0, "ALGERIA", 0),
        (1, "ARGENTINA", 1),
        (2, "BRAZIL", 1),
        (3, "", 2),          # empty name
        (4, None, 0),        # NULL name
        (5, "ETHIOPIA", None),   # NULL region fk
        (6, "FRANCE", 77),   # dangling region fk
        (7, "BRAZIL", 4),    # duplicate business name, other region
        (8, "côte d'ivoire \U0001f1e8\U0001f1ee", 0),  # accents + flags + quote
    ]
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([r[0] for r in rows], pa.int32()),
                "n_name": pa.array([r[1] for r in rows], pa.string()),
                "n_regionkey": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )


def write_customer(d: str) -> None:
    rows = [
        # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        (1, "Customer#000000001", 0, 711.56, "BUILDING"),
        (2, "Customer#000000002", 1, -272.6, "AUTOMOBILE"),
        (3, "", 2, 0.0, "MACHINERY"),          # empty name, zero balance
        (4, None, 3, None, None),              # NULL name/balance/segment
        (5, "Customer#000000005", None, 794.47, "HOUSEHOLD"),  # NULL nation fk
        (6, "Customer#000000006", 55, 7498.12, "BUILDING"),    # dangling nation fk
        (7, "  spaced  name  ", 4, 9561.95, "FURNITURE"),
        (8, "Customer#000000008", 5, 6819.74, "BUILDING"),
    ] + [
        # normal tail (keys 10..29): join/sampler material, two segments
        (
            10 + i,
            f"Customer#{10 + i:09d}",
            i % 9,
            round(100.0 * i - 500.0, 2),
            ["BUILDING", "AUTOMOBILE", "MACHINERY"][i % 3],
        )
        for i in range(20)
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "c_name": pa.array([r[1] for r in rows], pa.string()),
                "c_nationkey": pa.array([r[2] for r in rows], pa.int32()),
                "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
                "c_mktsegment": pa.array([r[4] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )


def write_part(d: str) -> None:
    rows = [
        # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
        (1, "goldenrod lavender spring chocolate lace", "Brand#13", "PROMO BURNISHED COPPER", 7, 901.0),
        (2, "", "Brand#13", "", 0, 0.0),       # empty name/type, zero size+price
        (3, None, None, None, None, None),     # all-NULL attributes
        (4, "chocolate metallic smoke ghost drab", "Brand#34", "MEDIUM BRUSHED STEEL", -1, -10.5),
    ] + [
        (
            10 + i,
            f"part {i} azure plum \U0001f527" if i % 5 == 0 else f"part {i} azure plum",
            f"Brand#{(i % 5) + 1}{(i % 3) + 1}",
            ["PROMO BURNISHED COPPER", "MEDIUM BRUSHED STEEL", "STANDARD POLISHED TIN"][i % 3],
            (i % 50) + 1,
            round(900.0 + i * 1.5, 2),
        )
        for i in range(16)
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_name": pa.array([r[1] for r in rows], pa.string()),
                "p_brand": pa.array([r[2] for r in rows], pa.string()),
                "p_type": pa.array([r[3] for r in rows], pa.string()),
                "p_size": pa.array([r[4] for r in rows], pa.int32()),
                "p_retailprice": pa.array([r[5] for r in rows], pa.float64()),
            }
        ),
        os.path.join(d, "part.parquet"),
    )


def write_supplier(d: str) -> None:
    rows = [
        (1, "Supplier#000000001", 0, 4032.68),
        (2, "", 1, 0.0),
        (3, None, None, None),
        (4, "Supplier#000000004", 88, -283.84),  # dangling nation fk
        (5, "Supplier#000000005", 4, 283.84),
    ]
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
                "s_name": pa.array([r[1] for r in rows], pa.string()),
                "s_nationkey": pa.array([r[2] for r in rows], pa.int32()),
                "s_acctbal": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        os.path.join(d, "supplier.parquet"),
    )


def write_orders(d: str) -> None:
    T = "1995-06-0"
    rows = [
        # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
        (1, 1, "O", 173665.47, T + "1 00:00:00", "5-LOW"),
        (2, 1, "O", 46929.18, T + "1 00:00:00", "1-URGENT"),   # same instant, same cust
        (3, 2, "F", None, T + "2 00:00:00", "5-LOW"),          # NULL price
        (4, None, "O", 32151.78, T + "3 00:00:00", ""),        # NULL cust fk, empty priority
        (5, 999, "F", 144659.2, None, None),                   # dangling cust fk, NULL date/priority
        (6, 3, "P", 0.0, T + "4 00:00:00", "2-HIGH"),          # zero price
        (7, 4, "O", -1.5, T + "5 00:00:00", "3-MEDIUM"),       # negative price
    ] + [
        (
            10 + i,
            10 + (i % 20),
            "OF"[i % 2],
            round(1000.0 + 37.5 * i, 2),
            f"1995-06-{(i % 28) + 1:02d} 00:00:00",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"][i % 5],
        )
        for i in range(30)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
                "o_orderdate": pa.array(
                    [None if r[4] is None else _ts(r[4]) for r in rows],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )


def write_lineitem(d: str) -> None:
    rows = [
        # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
        (1, 1, 1, 1, 17.0, 21168.23, 0.04, 0.02, "N", "O", "1995-06-10 00:00:00"),
        (1, 2, 2, 2, 36.0, 45983.16, 0.09, 0.06, "N", "O", "1995-06-10 00:00:00"),
        (2, 3, 1, 1, 0.0, 0.0, 0.0, 0.0, "R", "F", "1995-06-11 00:00:00"),   # zero line
        (3, 4, 2, 1, None, None, None, None, "A", "F", None),  # NULL measures+date
        (4, 1, 5, 1, 28.0, 28955.64, 1.0, 0.0, "N", "O", "1995-07-01 00:00:00"),  # 100% discount
        (5, 2, 4, 1, -3.0, -100.0, 0.05, 0.01, "R", "F", "1995-07-02 00:00:00"),  # negative qty (return)
        (999, 77, 88, 1, 5.0, 500.0, 0.02, 0.01, "N", "O", "1995-07-03 00:00:00"),  # dangling order fk
    ] + [
        (
            10 + (i % 25),
            1 + (i % 20),
            1 + (i % 5),
            (i // 25) + 1,
            float((i % 49) + 1),
            round(1000.0 + 11.25 * i, 2),
            (i % 10) / 100.0,
            (i % 8) / 100.0,
            "NRA"[i % 3],
            "OF"[i % 2],
            f"1995-{6 + (i % 3):02d}-{(i % 28) + 1:02d} 00:00:00",
        )
        for i in range(50)
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
                "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
                "l_discount": pa.array([r[6] for r in rows], pa.float64()),
                "l_tax": pa.array([r[7] for r in rows], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
                "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
                "l_shipdate": pa.array(
                    [None if r[10] is None else _ts(r[10]) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )


WRITERS = {
    "region": write_region,
    "nation": write_nation,
    "customer": write_customer,
    "supplier": write_supplier,
    "part": write_part,
    "orders": write_orders,
    "lineitem": write_lineitem,
    "events": write_events,
    "documents": write_documents,
    "embeddings": write_embeddings,
}
