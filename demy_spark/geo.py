"""Geo operators: address parsing, locality fuzzy match, admin-hierarchy
flatten, spatial (bbox) join.

Parity targets:
- Address number/postcode parse (geo/ParsedAddress.scala:42-67):
  regex heuristics splitting a free-text address into house number,
  street, 5-digit postcode, city tail.
- Locality fuzzy match + argmax (geo/AddressLocalizator.scala:27-31,
  76-95; TextTools.scala:90-129): candidate join + best-similarity
  reduce, expressed as levenshtein + window top-1 (the reference's
  groupByKey/reduceGroups argmax, re-expressed as Window.partitionBy
  + row_number per §2.3 of the survey).
- GeoNames hierarchy flatten (twitter/GeoNames.scala:9-128): chained
  parent-child self-joins building alias strings.
- Point-in-polygon with bbox prefilter (geo/GeoManager.scala:183-203,
  261-270): bbox range join is the Spark-native prefilter; the exact
  geometry verify is a pandas UDF gated behind shapely availability
  (geometry as WKB binary — no custom types).

Scale notes: the bbox join broadcasts the (small) polygon side; the
levenshtein match prunes candidates with a cheap length filter before
scoring; hierarchy flattening is plain equi-joins that Catalyst plans
as broadcasts at dimension sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# regexes shared verbatim with SQL oracles (RE2/Java-compatible subset)
_NUM_RE = r"^(\d+)"
_POSTCODE_RE = r"\b(\d{5})\b"


def parse_address(addr: Column | str) -> Column:
    """Split a free-text address into a struct
    (house_number int, postcode string, street string, city string).

    Heuristics per ParsedAddress.scala:42-67: leading digits are the
    house number; the first standalone 5-digit token is the postcode;
    text between number and postcode is the street; text after the
    postcode is the city."""
    a = F.trim(F.col(addr) if isinstance(addr, str) else addr)
    number = F.regexp_extract(a, _NUM_RE, 1)
    postcode = F.regexp_extract(a, _POSTCODE_RE, 1)
    no_number = F.trim(F.regexp_replace(a, _NUM_RE, ""))
    street = F.when(
        postcode != "", F.trim(F.split(no_number, _POSTCODE_RE).getItem(0))
    ).otherwise(no_number)
    # NULL address -> NULL city (regexp/split SQL semantics, matching
    # the other three fields); no-postcode -> empty city. The bare
    # otherwise(lit('')) manufactured '' out of a NULL address
    # (multi-table degenerate fuzz, r8).
    city = F.when(
        postcode != "", F.trim(F.element_at(F.split(no_number, _POSTCODE_RE), -1))
    ).otherwise(F.when(a.isNotNull(), F.lit("")))
    return F.struct(
        F.when(number != "", number.cast("int")).alias("house_number"),
        F.when(postcode != "", postcode).alias("postcode"),
        street.alias("street"),
        city.alias("city"),
    )


def best_locality_match(
    queries: DataFrame,
    localities: DataFrame,
    query_col: str,
    name_col: str,
    *,
    max_length_delta: int = 5,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Best locality per query string by minimum levenshtein distance
    (ties → name asc), the AddressLocalizator argmax re-expressed as a
    window top-1. A |len(a)-len(b)| ≤ max_length_delta prefilter bounds
    the candidate set before any distance is computed — levenshtein ≥
    length delta, so no true best match is lost when the accepted
    distance is below the cutoff."""
    from pyspark.sql import Window

    q = queries.withColumn("_q_", F.col(query_col))
    loc = localities.select(
        F.col(name_col).alias("_name_"), *(payload_cols or [])
    )
    cand = q.join(
        F.broadcast(loc),
        F.abs(F.length("_q_") - F.length("_name_")) <= max_length_delta,
    ).withColumn("_dist_", F.levenshtein("_q_", "_name_"))
    w = Window.partitionBy("_q_").orderBy(F.asc("_dist_"), F.asc("_name_"))
    return (
        cand.withColumn("_rk_", F.row_number().over(w))
        .where(F.col("_rk_") == 1)
        .drop("_rk_", "_q_")
        .withColumnRenamed("_name_", "matched_name")
        .withColumnRenamed("_dist_", "match_distance")
    )


def admin_hierarchy_flatten(
    levels: list[tuple[DataFrame, str, str, str]],
) -> DataFrame:
    """Flatten a parent-child admin hierarchy into one row per leaf with
    an alias path (GeoNames.scala:9-128's 5-level chain, generalized).

    ``levels`` is ordered root→leaf; each entry is
    (df, key_col, parent_key_col, name_col) — parent_key_col is ignored
    for the root. Output: leaf rows + ``path`` = 'root > ... > leaf'.

    A NULL name anywhere on the chain nulls the whole path (plain SQL
    ``||`` semantics, the engine-portable contract) — ``concat_ws``
    would silently SKIP the level and emit a shorter path that reads
    like a complete one (multi-table degenerate fuzz, r8); empty-string
    names are kept as empty segments.
    """
    root_df, root_key, _, root_name = levels[0]
    acc = root_df.select(
        F.col(root_key).alias("_k_"), F.col(root_name).alias("path")
    )
    for df, key, parent_key, name in levels[1:]:
        child = df.select(
            F.col(key).alias("_ck_"),
            F.col(parent_key).alias("_pk_"),
            F.col(name).alias("_n_"),
        )
        acc = (
            child.join(acc, child["_pk_"] == acc["_k_"])
            .select(
                F.col("_ck_").alias("_k_"),
                F.concat("path", F.lit(" > "), "_n_").alias("path"),
            )
        )
    return acc.withColumnRenamed("_k_", "leaf_key")


def point_in_bbox_join(
    points: DataFrame,
    boxes: DataFrame,
    *,
    x_col: str = "x",
    y_col: str = "y",
    bounds: tuple[str, str, str, str] = ("x_min", "x_max", "y_min", "y_max"),
) -> DataFrame:
    """Assign points to bounding boxes: broadcast the (small) box side,
    range-predicate join [min, max). This is the bbox prefilter the
    reference computes alongside each geometry (GeoManager.scala:
    183-203); compose with ``point_in_polygon_verify`` for exactness."""
    x0, x1, y0, y1 = bounds
    return points.join(
        F.broadcast(boxes),
        (points[x_col] >= boxes[x0])
        & (points[x_col] < boxes[x1])
        & (points[y_col] >= boxes[y0])
        & (points[y_col] < boxes[y1]),
    )


def point_in_polygon_raycast(
    df: DataFrame,
    *,
    xs_col: str = "xs",
    ys_col: str = "ys",
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "contains",
) -> DataFrame:
    """Exact point-in-polygon WITHOUT shapely: even-odd ray casting
    over vertex-array columns (``array<double>`` xs/ys, one entry per
    ring vertex, last edge wraps to the first vertex).

    This is the dependency-free exact path for the reference's IRIS
    assignment (AddressLocalizator.scala:32-36, GeoManager.scala:
    261-270): polygons travel as plain vertex arrays beside the WKB
    blob, the crossing count is one codegen'd ``F.aggregate`` fold per
    row — no UDF, no Python, and DuckDB can replay it bit-for-bit
    (queries.q72_point_in_polygon). Compose after point_in_bbox_join's
    rectangular prefilter so at scale the fold runs only on bbox
    candidates. A point exactly on an edge follows the even-odd
    convention (not guaranteed inside); keep test points off edges.
    """
    px, py = F.col(x_col), F.col(y_col)
    xs, ys = F.col(xs_col), F.col(ys_col)
    n = F.size(xs)

    def crosses(i):
        # edge from vertex i to vertex (i+1) mod n, 1-based element_at
        x1 = F.element_at(xs, i + 1)
        y1 = F.element_at(ys, i + 1)
        x2 = F.element_at(xs, (i + 1) % n + 1)
        y2 = F.element_at(ys, (i + 1) % n + 1)
        straddles = (y1 > py) != (y2 > py)
        # double division: y1==y2 edges are filtered by `straddles`, and
        # doubles never raise under ANSI (inf/nan fall out of the compare)
        x_at = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        return F.when(straddles & (px < x_at), 1).otherwise(0)

    crossings = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(0), lambda acc, i: acc + crosses(i)
    )
    return df.withColumn(out_col, crossings % 2 == 1)


def point_in_polygon_verify(
    df: DataFrame,
    *,
    wkb_col: str = "geometry",
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "contains",
) -> DataFrame:
    """Exact point-in-polygon over WKB geometry via shapely pandas UDF
    (AddressLocalizator.scala:32-36). The geometry travels as plain
    binary — no custom Spark types. Requires shapely; raises a clear
    error when the library is absent (not bundled in this container)."""
    try:
        import shapely  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without shapely
        raise NotImplementedError(
            "point_in_polygon_verify needs shapely; install it or use "
            "point_in_bbox_join's rectangular prefilter only"
        ) from e

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _contains(wkb: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
        from shapely import contains_xy, from_wkb

        geoms = from_wkb(wkb)
        return pd.Series(contains_xy(geoms, xs.to_numpy(), ys.to_numpy()))

    return df.withColumn(out_col, _contains(F.col(wkb_col), F.col(x_col), F.col(y_col)))
