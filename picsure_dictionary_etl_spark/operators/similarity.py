"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k against a query vector.
  The dot product is a codegen'd ``aggregate``/``zip_with`` fold (no
  Python); at 100 TB this is one scan + a size-k takeOrdered.
* ``lsh_bucketed_topk`` — random-hyperplane LSH: probe only vectors
  whose sign-bucket matches the query's (optionally multi-probe). The
  hyperplanes are deterministic pseudo-random values derived from
  xxhash64(dim, plane) so driver and executors agree without shipping
  matrices.
* ``pairwise_topk_per_label`` — IVF-style: exact search restricted to a
  coarse partition (here the ``label`` column standing in for an IVF
  cell assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.operators.dedup import _spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k. Similarity is rounded before
    ranking so ordering is stable across engines/float-sum orders;
    ties break on id."""
    q = F.lit([float(x) for x in query_vec])  # ONE literal, not dim py4j calls
    scored = df.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), round_digits).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def hyperplane_coeffs(dim: int, planes: int = 8, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane matrix: coefficient (p, d)
    = md5-derived value in [-1, 1). Computed ONCE driver-side and
    embedded as plan literals — zero shipped state, zero per-row
    hashing (the previous xxhash64-in-a-lambda design re-derived every
    coefficient for every row), and any engine reproduces the matrix
    from the same published formula (DuckDB oracle parity)."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{d}|{p}|{seed}".encode()).hexdigest()[:15], 16) % 2_000_000)
            / 1_000_000.0
            - 1.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def _projections(
    vec_col: Column, dim: int, planes: int, seed: int, round_digits: int
) -> Column:
    """``array<double>`` of the vector's rounded projections onto every
    hyperplane. The coefficient matrix ships as ``planes`` array
    LITERALS folded by a higher-order ``transform`` — a constant-size
    expression regardless of ``dim``. (The previous per-element
    ``F.lit`` construction made planes x dim py4j round trips: ~3 s of
    DRIVER time per plan build at dim=64, dwarfing the 1 s execution.)
    The fold order inside ``_dot`` is unchanged, so projections — and
    therefore bucket ids — are bit-identical to the old construction."""
    coeffs = hyperplane_coeffs(dim, planes, seed)
    mat = F.array(*[F.lit(row) for row in coeffs])
    return F.transform(mat, lambda row: F.round(_dot(vec_col, row), round_digits))


def _bucket_of(projs: Column, planes: int) -> Column:
    if planes <= 0:
        # degenerate everything-in-one-bucket mode (the brute-force
        # oracle used by recall tests); an empty F.lit([]) is
        # void-typed and breaks zip_with, so short-circuit
        return F.lit(0).cast("long")
    powers = F.lit([2**p for p in range(planes)])
    return F.aggregate(
        F.zip_with(
            projs,
            powers,
            lambda v, w: F.when(v > 0, w.cast("long")).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hyperplane_bucket(
    vec_col: Column, dim: int, planes: int = 8, seed: int = 0, round_digits: int = 9
) -> Column:
    """Sign-pattern bucket id from ``planes`` pseudo-random hyperplanes.
    The projection is rounded before the sign test so bucket ids are
    stable across engines' float-sum orderings (same trick as
    ``cosine_topk``'s pre-rank rounding)."""
    bucket = _bucket_of(_projections(vec_col, dim, planes, seed, round_digits), planes)
    return bucket


def probe_buckets(
    vec_col: Column,
    dim: int,
    planes: int = 8,
    seed: int = 0,
    extra: int = 0,
    round_digits: int = 9,
) -> Column:
    """Multi-probe bucket set (``array<long>``): the vector's own
    sign-bucket plus ``extra`` buckets obtained by flipping the
    lowest-|margin| hyperplane bits — the planes the vector sits
    closest to, i.e. where a true near-neighbor most plausibly landed
    on the other side. Entirely in-plan (sort_array over
    (|margin|, plane) structs + transform), no driver work, no UDF."""
    if planes <= 0:
        return F.array(F.lit(0).cast("long"))  # single-bucket oracle mode
    projs = _projections(vec_col, dim, planes, seed, round_digits)
    bucket = _bucket_of(projs, planes)
    if extra <= 0:
        return F.array(bucket)
    margins = F.sort_array(
        F.zip_with(
            projs,
            F.lit(list(range(planes))),
            lambda v, p: F.struct(F.abs(v).alias("m"), p.alias("p")),
        )
    )
    flips = F.slice(margins, 1, min(extra, planes))
    flipped = F.transform(
        flips, lambda s: bucket.bitwiseXOR(F.pow(F.lit(2.0), s["p"]).cast("long"))
    )
    return F.concat(F.array(bucket), flipped)


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 8,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket(s). The query's probe-bucket set is a 1-row broadcast joined
    in-plan (identical arithmetic to the data side, no driver collect,
    no extra job). ``probes`` > 1 additionally searches the buckets
    reached by flipping the query's lowest-|margin| bits — the standard
    multi-probe recall lever at loose thresholds. At scale, persist the
    bucket column (or make it a partition key) so the probe is a
    partition-pruned scan."""
    dim = len(query_vec)
    spark = df.sparkSession
    q = F.lit([float(x) for x in query_vec])  # ONE literal, not dim py4j calls
    qdf = spark.range(1).select(
        F.explode(probe_buckets(q, dim, planes, extra=probes - 1)).alias("_qb")
    )
    bucketed = _spread(df, id_col).withColumn(
        "_b", hyperplane_bucket(F.col(vec_col), dim, planes)
    )
    # distinct single-bit flips always differ, so the join can't dupe rows
    cand = bucketed.join(F.broadcast(qdf), F.col("_b") == F.col("_qb")).drop("_qb")
    return cosine_topk(cand, query_vec, id_col, vec_col, k)


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    planes: int = 8,
    round_digits: int = 6,
    dim: int | None = None,
    multi_probe: int = 0,
) -> DataFrame:
    # (dim is required — see ValueError below; keyword kept in place for
    # call-site compatibility.)
    """Embedding-cosine near-dup pairs: candidates are generated ONLY
    inside hyperplane sign buckets (two vectors at cosine >= ~0.98 agree
    on almost every random hyperplane, so same-bucket recall is high),
    then verified exactly. Never all-pairs: shuffle key = bucket id; at
    scale the bucket is a partition column and each bucket's candidate
    join is local.

    ``dim`` is REQUIRED (the caller always knows it; the old
    ``first()``-probe fallback cost an extra Spark job and raised on
    empty input). ``multi_probe`` > 0 additionally registers each vector
    under that many flipped lowest-|margin| buckets (explode factor
    1+multi_probe per side) — the recall lever for thresholds below
    ~0.95, where single-bucket agreement decays; pairs meeting in
    several probe buckets dedupe before the exact verify."""
    if dim is None:
        raise ValueError(
            "embedding_near_duplicates requires dim= (embedding length); "
            "the driver-job .first() fallback was removed"
        )
    # the hyperplane projections are planes*dim multiply-adds per row:
    # spread a narrow (single-file) scan first or they serialize
    bucketed = _spread(df, id_col).select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            probe_buckets(F.col(vec_col), dim, planes, extra=multi_probe)
        ).alias("_b"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a._b") == F.col("b._b")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col(f"a.{vec_col}").alias("_va"),
        F.col(f"b.{vec_col}").alias("_vb"),
    )
    if multi_probe > 0:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    sim = F.round(cosine(F.col("_va"), F.col("_vb")), round_digits)
    return (
        pairs.select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def pairwise_topk_per_label(
    df: DataFrame,
    query_vec: list[float],
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """IVF-style coarse partition probe: top-k within each label cell
    (window over rounded similarity, deterministic tie-break)."""
    from pyspark.sql import Window

    q = F.lit([float(x) for x in query_vec])  # ONE literal, not dim py4j calls
    scored = df.select(
        F.col(label_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(label_col).orderBy(F.desc("cosine_sim"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
