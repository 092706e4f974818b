"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH bucketing as the scale path (query cost drops from O(n) to O(bucket)).

All vector math is JVM-side HOFs (``zip_with`` + ``aggregate``) over the
array column — no Python, no UDFs. Elements are cast to double *before*
multiply/accumulate so both engines fold the identical IEEE sequence.

Scale stance: brute-force top-k against one query is a single narrow pass +
TakeOrdered — fine at any corpus size for one query. For query *batches*,
bucket both sides with the same hyperplanes (q62's bucket id) and join on
the bucket — the ANN analog of the LSH band join in dedup.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from setu_spark.functions.hashes import hash64, hash64_sql
from setu_spark.registry import register
from setu_spark.sources.io import load_table

DIM = 64
N_PLANES = 8


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i with double accumulation, sequential fold (oracle-exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------- q60
@register(
    "q60_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    pairs AS (
      -- two unnests in the SELECT clause zip positionally in DuckDB
      SELECT v.vec_id, v.label,
             CAST(unnest(v.embedding) AS DOUBLE) AS x,
             CAST(unnest(q.qe) AS DOUBLE) AS y
      FROM embeddings v CROSS JOIN q
      WHERE v.vec_id > 0
    ),
    sims AS (
      SELECT vec_id, any_value(label) AS label,
             round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6)
               AS cosine_sim
      FROM pairs GROUP BY vec_id
    )
    SELECT vec_id, label, cosine_sim
    FROM sims
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def q60_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 query vector.
    The query vector is collected once and inlined as a literal array (the
    one-row broadcast); the scan side is a narrow projection + TakeOrdered."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        emb.filter(F.col("vec_id") > 0)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), qlit), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------- q61
@register(
    "q61_label_centroids",
    oracle="""
    SELECT label, i AS dim,
           count(*) AS n_vecs,
           round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,9)))
                      AS DOUBLE) / count(*), 6) AS centroid_val
    FROM (
      -- SELECT-clause unnest + generate_subscripts zip positionally
      SELECT label,
             unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    )
    GROUP BY label, i
    """,
)
def q61_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids as a (label, dim, mean) table: posexplode the
    vector, aggregate per (label, dim) — one shuffle, map-side combined.
    Float sums go through DECIMAL(27,9) for order-independence."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("i0", "x")
    ).select("label", (F.col("i0") + 1).alias("dim"), "x")
    return exploded.groupBy("label", "dim").agg(
        F.count("*").alias("n_vecs"),
        F.round(
            F.sum(F.col("x").cast("double").cast("decimal(27,9)"))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("centroid_val"),
    )


# ---------------------------------------------------------------- q62
def _planes_sql() -> str:
    h = hash64_sql("CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)", salt="plane")
    return f"""
    WITH planes AS (
      SELECT j, i,
             CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END AS sgn
      FROM unnest(range(0, {N_PLANES})) AS uj(j),
           unnest(range(1, {DIM + 1})) AS ui(i)
    ),
    comps AS (
      SELECT e.vec_id, p.j,
             sum(p.sgn * CAST(e.x AS DOUBLE)) AS proj
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings) e
      JOIN planes p ON e.i = p.i
      GROUP BY e.vec_id, p.j
    )
    SELECT vec_id,
           CAST(sum(CASE WHEN proj > 0 THEN CAST(1 AS BIGINT) << j
                         ELSE 0 END) AS BIGINT) AS bucket
    FROM comps
    GROUP BY vec_id
    """


@register("q62_ann_lsh_buckets", oracle=_planes_sql())
def q62_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing (the ANN scale path): 8 deterministic
    ±1 hyperplanes (signs derived from the shared md5 hash so the oracle can
    reproduce them); bucket id = sign-pattern of the 8 projections.
    Composition: posexplode embeddings ⋈ broadcast plane table → one
    aggregate per (vec, plane) → one per vec."""
    spark_planes = (
        spark.range(N_PLANES)
        .withColumnRenamed("id", "j")
        .crossJoin(
            spark.range(1, DIM + 1).withColumnRenamed("id", "i")
        )
        .select(
            "j",
            "i",
            F.when(
                hash64(
                    F.concat_ws(
                        "_", F.col("j").cast("string"), F.col("i").cast("string")
                    ),
                    salt="plane",
                )
                % 2
                == 0,
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("sgn"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "x")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    comps = (
        exploded.join(F.broadcast(spark_planes), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("sgn") * F.col("x").cast("double")).alias("proj"))
    )
    return comps.groupBy("vec_id").agg(
        F.sum(
            F.when(
                F.col("proj") > 0,
                F.expr("shiftleft(cast(1 as bigint), cast(j as int))"),
            ).otherwise(F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("bucket")
    )
