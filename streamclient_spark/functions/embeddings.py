"""Embedding-column utilities for training-data pipelines (SURVEY.md
§2C): int8 quantization and per-label centroids over the
``embeddings`` fixture table (``vec_id, embedding list<float>[64],
label``).

Both operators are pure built-in projections/aggregations — no Python
on the hot path, no UDFs — and both carry DuckDB oracles.

Cross-engine float determinism: float32→double conversion is exact, so
row-local arithmetic (quantization) hash-matches directly. Cross-ROW
float aggregation (centroid means) is order-dependent in IEEE
arithmetic, so the centroid is defined on a fixed-point grid:
``floor(x·10^6 + 0.5)`` per element (exact BIGINT), summed as longs
(whole-stage codegen, overflow margin ~2^53/1e6 rows per group), then
one IEEE division at the end — the same convention the money
aggregates use (streamclient_spark/compat.py), applied at 1e-6
resolution. At 100 TB this is also the *right* semantics: a centroid
accumulated in fixed point is reproducible across partitionings,
retries, and cluster sizes, which float sums are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load, split_recovery


@register(
    "q_embed_quantize",
    oracle="""
    SELECT vec_id, label,
           CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS scale,
           array_to_string(list_transform(
             embedding,
             x -> CAST(FLOOR(CAST(x AS DOUBLE)
                             * (CASE WHEN mx = 0 THEN 0.0
                                     ELSE 127.0 / mx END)
                             + 0.5) AS INT)), ',') AS qvec
    FROM (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM embeddings
    )
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    scale ``127 / max|x|`` and the quantized array
    ``floor(x·scale + 0.5)`` (explicit floor-plus-half instead of
    ``round`` — engines disagree on round-half rules, floor does not).

    The 4× size reduction is the standard first step before shipping
    vectors into an ANN index. 100 TB plan: a stateless row-local
    projection over built-in higher-order functions (``transform`` /
    ``array_max``) — whole-stage codegen, zero shuffle, zero Python;
    runs at parquet scan speed and parallelizes embarrassingly.
    Zero-vectors quantize to all-zeros with scale 0 (guarded division).

    The split-recovery ``repartition`` exists because the fixture
    writes the table as ONE parquet row group (one task regardless of
    cores — measured 5.5 s single-task vs 0.6 s split at sf1); with a
    real multi-split table it is a no-op to delete. The higher-order
    lambdas are Catalyst-interpreted per element, which is acceptable
    here (64 elements/row) — unlike the per-token text ops, which use
    fused Arrow passes."""
    e = load(spark, sf_dir, "embeddings").transform(
        split_recovery(spark, sf_dir, "embeddings")
    )
    mx = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    # scale is MATERIALIZED as a column before the quantizing lambda:
    # referencing the scale *expression* inside the per-element lambda
    # re-evaluates the array_max sub-expression for every element —
    # O(dim²) interpreted evals per row, measured 9 s vs 0.6 s at sf1
    withscale = e.select(
        "vec_id",
        "label",
        "embedding",
        F.when(mx == 0, F.lit(0.0))
        .otherwise(F.lit(127.0) / mx)
        .alias("scale"),
    )
    # qvec is RENDERED to a comma-joined string for the oracle check:
    # integer-array cells round-trip as numpy ndarrays on the DuckDB
    # side but Python lists on the no-Arrow Spark side, so a raw
    # array column hash-flaps depending on the session's Arrow conf
    # (same convention as q_fn_array's sorted_vocab)
    return withscale.select(
        "vec_id",
        "label",
        "scale",
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(
                    x.cast("double") * F.col("scale") + F.lit(0.5)
                ).cast("int"),
            ),
            ",",
        ).alias("qvec"),
    )


@register(
    "q_embed_centroids",
    oracle="""
    SELECT label, dim,
           CAST(SUM(fx) AS DOUBLE) / (COUNT(*) * 1000000.0) AS centroid,
           COUNT(*) AS n_vectors
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS fx
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids — the M-step of distributed k-means and the
    building block for IVF codebook training
    (cf. functions/similarity.py's literal codebook, which this
    operator would replace at real corpus sizes).

    Output is one ``(label, dim, centroid, n_vectors)`` row per
    label×dimension on the 1e-6 fixed-point grid (module docstring).
    100 TB plan: ``posexplode`` multiplies rows by the dimension count
    *before* the shuffle, but the partial aggregate collapses each
    (label, dim) to one long pair per task, so the exchange moves
    |labels|·|dims| rows per task regardless of corpus size — the
    explode never hits the wire. Long sums stay in whole-stage
    codegen; the division happens once per output row."""
    e = load(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "label",
        "dim",
        F.floor(
            F.col("val").cast("double") * F.lit(1000000.0) + F.lit(0.5)
        ).cast("bigint").alias("fx"),
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.sum("fx").alias("_s"),
            F.count("*").alias("n_vectors"),
        )
        .select(
            "label",
            "dim",
            (
                F.col("_s").cast("double")
                / (F.col("n_vectors") * F.lit(1000000.0))
            ).alias("centroid"),
            "n_vectors",
        )
    )


# ---------------------------------------------------------------------------
# q_embed_pq — product quantization (8 subspaces × 16 codes)
# ---------------------------------------------------------------------------

#: 64-dim vectors split into 8 contiguous 8-dim subspaces; each
#: subspace coded against the 16 deterministic centroid vectors
#: (vec_id 100..115, the same codebook q_sim_ivf uses) sliced to that
#: subspace → one byte-sized code per subspace, 8 bytes per vector
#: (32× compression over float32).
PQ_SUBSPACES = 8
PQ_SUBDIM = 8


@register(
    "q_embed_pq",
    oracle="""
    WITH c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
      FROM embeddings WHERE vec_id BETWEEN 100 AND 115
    ),
    sub AS (
      SELECT gs.s, e.vec_id, CAST(e.embedding AS DOUBLE[]) AS xe,
             list_slice(CAST(e.embedding AS DOUBLE[]), gs.s*8+1, gs.s*8+8)
               AS xs
      FROM embeddings e CROSS JOIN (SELECT unnest(range(8)) AS s) gs
    ),
    scored AS (
      SELECT sub.s, sub.vec_id, sub.xe,
             list_slice(c.ce, sub.s*8+1, sub.s*8+8) AS cs,
             row_number() OVER (
               PARTITION BY sub.vec_id, sub.s
               ORDER BY list_distance(
                          sub.xs, list_slice(c.ce, sub.s*8+1, sub.s*8+8)),
                        c.cid) AS rn,
             c.cid
      FROM sub CROSS JOIN c
    ),
    win AS (SELECT * FROM scored WHERE rn = 1),
    agg AS (
      SELECT vec_id,
             string_agg(CAST(cid - 100 AS VARCHAR), ',' ORDER BY s)
               AS pq_code,
             flatten(list(cs ORDER BY s)) AS recon,
             any_value(xe) AS xe
      FROM win GROUP BY vec_id
    )
    SELECT vec_id, pq_code,
           round(list_cosine_similarity(xe, recon), 6) AS recon_cos
    FROM agg
    """,
)
def q_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (PQ) — the vector-compression scheme of
    every large-scale ANN index (FAISS IVF-PQ): split each 64-dim
    vector into 8 contiguous 8-dim subvectors, code each against a
    16-entry sub-codebook by nearest-L2, store 8 small codes (8 bytes,
    32× smaller than float32). Output per vector: the code word (as a
    comma string — both engines render it identically), and the cosine
    between the vector and its PQ reconstruction (the compression-
    quality metric a pipeline monitors).

    The sub-codebooks are the 16 deterministic IVF centroid vectors
    sliced per subspace — no RNG, no fitted state, any engine derives
    them from the data alone. One fused Arrow pass per corpus
    partition computes all 8 argmins as small GEMMs (the ‖x−c‖² =
    ‖x‖²−2x·c+‖c‖² expansion) plus the reconstruction cosine; numpy's
    first-min tie rule equals the oracle's (dist, cid) order because
    codebook rows are cid-ordered, and fixture sub-distance gaps
    (≳1e-3) dwarf GEMM-vs-fold drift (~1e-15). Shuffle-free — the
    codebook rides in the closure; at 100 TB the coded corpus is what
    an ADC search scans (distance tables against codes), cutting
    memory traffic 32×."""
    import numpy as np
    import pandas as pd

    from streamclient_spark.functions.similarity import _centroid_literals

    centroids = _centroid_literals(spark, sf_dir)
    C = np.stack(
        [np.asarray(vec, dtype=np.float64) for _, vec, _ in centroids]
    )  # 16 × 64, cid-ordered

    def code(batches):
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = len(E)
            codes = np.empty((n, PQ_SUBSPACES), dtype=np.int64)
            recon = np.empty_like(E)
            for s in range(PQ_SUBSPACES):
                sl = slice(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM)
                X, Cs = E[:, sl], C[:, sl]
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    - 2.0 * (X @ Cs.T)
                    + (Cs * Cs).sum(axis=1)[None, :]
                )
                codes[:, s] = np.argmin(d2, axis=1)  # first-min = cid asc
                recon[:, sl] = Cs[codes[:, s]]
            cos = (E * recon).sum(axis=1) / (
                np.sqrt((E * E).sum(axis=1))
                * np.sqrt((recon * recon).sum(axis=1))
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "pq_code": [
                        ",".join(str(c) for c in row) for row in codes
                    ],
                    "recon_cos": cos,
                }
            )

    e = load(spark, sf_dir, "embeddings")
    # split recovery (near-unsplittable fixture file, CPU-bound GEMM)
    return (
        e.select("vec_id", "embedding")
        .transform(split_recovery(spark, sf_dir, "embeddings"))
        .mapInPandas(code, "vec_id bigint, pq_code string, recon_cos double")
        .select("vec_id", "pq_code", F.round("recon_cos", 6).alias("recon_cos"))
    )


# ---------------------------------------------------------------------------
# kmeans_fit — distributed Lloyd's k-means (iterative; library function)
# ---------------------------------------------------------------------------


def kmeans_fit(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = 8,
    max_iters: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    grid: int = 10**6,
):
    """Distributed Lloyd's k-means over an embedding column — the
    iterative-algorithm shape (codebook training for IVF/PQ indexes,
    corpus clustering for mixture design) that a SQL oracle cannot
    express; correctness is pinned by property tests instead
    (determinism, monotone inertia, true-argmin assignments).

    Why this scales to 100 TB — each iteration is ONE fused Arrow pass:
    the k×d codebook rides in the task closure, every partition runs a
    BLAS GEMM assignment (argmin ‖x−c‖² = argmin ‖c‖² − 2·x·c) and
    accumulates per-centroid PARTIAL sums locally, emitting k rows per
    partition (cid, count, element sums). The shuffle/collect volume is
    O(partitions × k × d) — independent of corpus size; the corpus
    itself is never shuffled and never re-keyed. The driver holds only
    the codebook and the convergence test (control flow, not data).

    Determinism (retry/partitioning-reproducible, the q_embed_centroids
    convention): element sums accumulate on a fixed-point grid
    (``floor(x·grid + 0.5)`` per element, exact int64), so the new
    centroid is one IEEE division of exact integers — identical under
    any partitioning, task retry, or cluster size. Ties in the argmin
    go to the lowest centroid id (numpy argmin first-occurrence).
    Initialization is deterministic: the vectors of the k smallest ids.

    Returns ``(centroids, assign, history)``: the final k×d codebook
    (list of lists), a zero-argument callable producing the assignment
    DataFrame ``(id, cid)`` for the final codebook, and the per-
    iteration inertia history (floats; monitoring only — inertia is a
    float partial sum and is NOT part of the deterministic state).

    Empty clusters keep their previous centroid (the standard Lloyd
    fallback; deterministic)."""
    import numpy as np
    import pandas as pd

    vecs = vectors.select(
        F.col(id_col).alias("id"), F.col(emb_col).alias("emb")
    )

    init = [
        [float(x) for x in r["emb"]]
        for r in vecs.orderBy("id").limit(k).collect()
    ]
    if len(init) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init)}")

    schema = "cid int, n long, s array<long>, sse double"

    def estep(codebook):
        C = np.asarray(codebook, dtype=np.float64)
        cn2 = (C * C).sum(axis=1)

        def run(batches):
            kk, d = C.shape
            sums = np.zeros((kk, d), dtype=np.int64)
            cnts = np.zeros(kk, dtype=np.int64)
            sse = 0.0
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["emb"]]
                )
                a = np.argmin(cn2[None, :] - 2.0 * (X @ C.T), axis=1)
                Xg = np.floor(X * grid + 0.5).astype(np.int64)
                for ci in np.unique(a):
                    m = a == ci
                    sums[ci] += Xg[m].sum(axis=0)
                    cnts[ci] += int(m.sum())
                sse += float(((X - C[a]) ** 2).sum())
            yield pd.DataFrame(
                {
                    "cid": list(range(kk)),
                    "n": cnts,
                    "s": [sums[ci].tolist() for ci in range(kk)],
                    "sse": [sse] + [0.0] * (kk - 1),
                }
            )

        return run

    centroids = init
    history: list[float] = []
    for _ in range(max_iters):
        parts = vecs.mapInPandas(estep(centroids), schema)
        # partials are O(partitions×k): explode to elements and reduce.
        # One tiny job; the collect is k×d rows, never corpus data.
        rows = (
            parts.select(
                "cid", "n", "sse", F.posexplode("s").alias("pos", "v")
            )
            .groupBy("cid", "pos")
            .agg(
                F.sum("v").alias("sv"),
                F.sum("n").alias("sn"),
                F.sum("sse").alias("ssse"),
            )
            .collect()
        )
        d = len(centroids[0])
        sums = np.zeros((k, d), dtype=np.int64)
        cnts = np.zeros(k, dtype=np.int64)
        sse = 0.0
        for r in rows:
            sums[r["cid"]][r["pos"]] = r["sv"]
            if r["pos"] == 0:
                cnts[r["cid"]] = r["sn"]
                sse += r["ssse"]
        history.append(sse)
        new = []
        for ci in range(k):
            if cnts[ci] == 0:
                new.append(list(centroids[ci]))
            else:
                new.append(
                    [float(sums[ci][j]) / (cnts[ci] * grid) for j in range(d)]
                )
        if new == centroids:
            break
        centroids = new

    final = [list(c) for c in centroids]

    def assign() -> DataFrame:
        C = np.asarray(final, dtype=np.float64)
        cn2 = (C * C).sum(axis=1)

        def run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["emb"]]
                )
                a = np.argmin(cn2[None, :] - 2.0 * (X @ C.T), axis=1)
                yield pd.DataFrame({"id": pdf["id"], "cid": a.astype("int32")})

        return vecs.mapInPandas(run, "id long, cid int")

    return final, assign, history


# ---------------------------------------------------------------------------
# q_embed_outliers — distance-to-centroid embedding-space audit
# ---------------------------------------------------------------------------

#: cosine-to-own-centroid below this → flagged (compared on the rounded
#: value so both engines test identical doubles). Sits mid-gap in the
#: fixture's 2.6e-2-wide tail gap (~3% flagged) — no value within 1e-2,
#: so cross-engine drift cannot flip a flag.
OUTLIER_TAU = -0.0773


@register(
    "q_embed_outliers",
    oracle=f"""
    WITH fx AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS fx
      FROM embeddings
    ),
    cent AS (
      SELECT label, dim,
             CAST(SUM(fx) AS DOUBLE) / (COUNT(*) * 1000000.0) AS c
      FROM fx GROUP BY label, dim
    ),
    cvec AS (
      SELECT label, list(c ORDER BY dim) AS centroid FROM cent GROUP BY label
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        cv.centroid), 6) AS cos_centroid,
           CAST(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             cv.centroid), 6) < {OUTLIER_TAU}
                AS INT) AS is_outlier
    FROM embeddings e JOIN cvec cv USING (label)
    """,
)
def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space quality audit: every vector's cosine to its own
    label centroid, flagging the far tail — mislabeled / corrupted /
    off-distribution vectors (the embedding twin of the q_dq_outliers
    value screen). Centroids come from the SAME exact 1e-6-grid mean
    as q_embed_centroids (long sums — partition-order-independent),
    assembled into per-label arrays entirely JVM-side (array_sort of
    collect_list over (dim, value) structs — 10 rows of 64 doubles)
    and broadcast into a codegen sequential-fold cosine: no Python
    anywhere, one corpus scan for centroids + one for scoring. The
    flag compares the ROUNDED cosine so both engines test identical
    doubles against τ={OUTLIER_TAU}."""
    from streamclient_spark.functions.vectors import cosine

    e = load(spark, sf_dir, "embeddings")
    fx = e.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "label",
        "dim",
        F.floor(F.col("x").cast("double") * 1000000.0 + 0.5)
        .cast("long")
        .alias("fx"),
    )
    cent = fx.groupBy("label", "dim").agg(
        (F.sum("fx").cast("double") / (F.count(F.lit(1)) * 1000000.0)).alias(
            "c"
        )
    )
    cvec = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda s: s.c,
        ).alias("centroid")
    )
    cos_r = F.round(
        cosine(F.col("embedding").cast("array<double>"), F.col("centroid")), 6
    )
    return (
        e.join(F.broadcast(cvec), "label")
        .select(
            "vec_id",
            "label",
            cos_r.alias("cos_centroid"),
            (cos_r < OUTLIER_TAU).cast("int").alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# q_embed_dim_stats — per-dimension embedding-space health (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_embed_dim_stats",
    oracle="""
    WITH fx AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS fx
      FROM embeddings
    ),
    s AS (
      SELECT dim, count(*) AS n, SUM(fx) AS s1, SUM(fx * fx) AS s2,
             min(fx) AS min_fx, max(fx) AS max_fx
      FROM fx GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(n AS BIGINT) AS n_vecs,
           round(CAST(s1 AS DOUBLE) / n / 1000000.0, 6) AS mean,
           round((CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                 / n / 1e12, 6) AS variance,
           CAST(min_fx AS BIGINT) AS min_micro,
           CAST(max_fx AS BIGINT) AS max_micro
    FROM s
    """,
)
def q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics — mean, variance, range on
    the 1e-6 fixed-point grid — the space-health report that catches
    dead dimensions (variance ≈ 0: wasted capacity), dominant
    dimensions (one dim carrying the norm: cosine degenerates to that
    coordinate), and un-centered spaces (|mean| >> 0: anisotropy, the
    reason mean-centering precedes whitening). Run it before trusting
    any cosine threshold; q_embed_sim_hist is the pairwise view, this
    is the marginal one.

    Exactness: elements land on the fixed-point grid (module
    docstring), per-dim Σfx and Σfx² are exact long sums, and both
    engines then apply the IDENTICAL double expression — one cast per
    sum, same division order — so the rounded outputs are
    bit-identical. Σfx² fits int64 to ~9e6 vectors/dim at unit scale;
    the decimal-limb device is the named escape beyond.

    Plan: posexplode multiplies rows by 64 BEFORE the shuffle but the
    partial aggregate collapses each task to 64 rows (the
    q_embed_centroids shape) — the explode never hits the wire. One
    map-combined aggregate; 64 output rows; scan-bound at 100 TB."""
    e = load(spark, sf_dir, "embeddings")
    fx = e.select(
        F.posexplode("embedding").alias("dim", "val")
    ).select(
        "dim",
        F.floor(
            F.col("val").cast("double") * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("fx"),
    )
    s = fx.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("fx").alias("s1"),
        F.sum(F.col("fx") * F.col("fx")).alias("s2"),
        F.min("fx").alias("min_fx"),
        F.max("fx").alias("max_fx"),
    )
    return s.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("long").alias("n_vecs"),
        F.round(
            F.col("s1").cast("double") / F.col("n") / F.lit(1000000.0), 6
        ).alias("mean"),
        F.round(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / F.col("n")
            )
            / F.col("n")
            / F.lit(1e12),
            6,
        ).alias("variance"),
        F.col("min_fx").cast("long").alias("min_micro"),
        F.col("max_fx").cast("long").alias("max_micro"),
    )


# ---------------------------------------------------------------------------
# q_embed_pca_power — dominant principal component by fixed-point
# power iteration (round 4)
# ---------------------------------------------------------------------------

#: power-iteration steps for q_embed_pca_power. NOT a convergence
#: bound: both engines run EXACTLY this many fixed-point steps, so the
#: reported Rayleigh quotient is a deterministic 8-step statistic —
#: there is no fixpoint to desync from (unlike the BFS/CC/k-core
#: unrolls, which must cover engine convergence).
_PCA_STEPS = 8


def _sql_pca_oracle() -> str:
    """Replay the identical fixed-point power iteration in SQL: exact
    HUGEINT covariance numerators, permille-grid eigenvector, and
    truncating renormalization each step."""
    head = """
    WITH fx AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS fx
      FROM embeddings
    ),
    nn AS (SELECT count(*) AS n FROM embeddings),
    s AS MATERIALIZED (SELECT i, SUM(fx) AS si FROM fx GROUP BY i),
    g AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j, SUM(a.fx * b.fx) AS gij
      FROM fx a JOIN fx b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ),
    c AS MATERIALIZED (
      SELECT g.i, g.j,
             CAST(nn.n AS HUGEINT) * gij
               - CAST(sa.si AS HUGEINT) * sb.si AS c
      FROM g CROSS JOIN nn
      JOIN s sa ON sa.i = g.i JOIN s sb ON sb.i = g.j
    ),
    v0 AS (SELECT i, CAST(1000 AS HUGEINT) AS v FROM s)
    """
    steps = []
    prev = "v0"
    for k in range(1, _PCA_STEPS + 1):
        steps.append(f"""
    , w{k} AS MATERIALIZED (
        SELECT c.i, SUM(c.c * {prev}.v) AS w
        FROM c JOIN {prev} ON c.j = {prev}.i GROUP BY c.i
    ), v{k} AS MATERIALIZED (
        SELECT i, (w * 1000) // (SELECT max(abs(w)) FROM w{k}) AS v
        FROM w{k}
    )""")
        prev = f"v{k}"
    tail = f"""
    , num AS (
      SELECT SUM(va.v * c.c * vb.v) AS num
      FROM c JOIN {prev} va ON c.i = va.i
             JOIN {prev} vb ON c.j = vb.i
    ),
    den AS (SELECT SUM(v * v) AS den FROM {prev}),
    tr AS (SELECT SUM(c) AS tr FROM c WHERE i = j),
    top AS (
      SELECT i AS top_dim, CAST(v AS BIGINT) AS top_loading_permille
      FROM {prev} ORDER BY abs(v) DESC, i LIMIT 1
    )
    SELECT CAST(nn.n AS BIGINT) AS n_vecs,
           CAST(top.top_dim AS INT) AS top_dim,
           top.top_loading_permille,
           round(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE)
                 / nn.n / nn.n / 1e12, 6) AS lambda_variance,
           round(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE)
                 / CAST(tr.tr AS DOUBLE), 6) AS variance_share
    FROM nn CROSS JOIN num CROSS JOIN den CROSS JOIN tr CROSS JOIN top
    """
    return head + "".join(steps) + tail


@register("q_embed_pca_power", oracle=_sql_pca_oracle())
def q_embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding space by
    FIXED-POINT power iteration — the anisotropy / collapse detector
    (a healthy space spreads variance across components;
    variance_share → 1 means every cosine is really measuring one
    axis, the classic "embedding collapse" failure that breaks both
    ANN recall and SemDeDup thresholds). Reports the 8-step Rayleigh
    quotient (as per-element variance), its share of total variance,
    and the dominant dimension with its permille loading —
    q_embed_dim_stats' marginal view upgraded to the spectral one.

    Determinism is by construction, not convergence: the covariance
    numerators C = n·G − s·sᵀ are EXACT integers (grid elements →
    long Gram sums → decimal/HUGEINT products), the eigenvector
    lives on an integer permille grid, each renormalization is a
    truncating integer division, and BOTH engines run exactly
    _PCA_STEPS steps — identical integer state throughout, two final
    IEEE divisions, one round. No libm in any iterate.

    Plan: the Gram/column-sum/count partials are computed per
    partition in ONE Arrow pass — each task quantizes its rows to the
    integer micro grid and contracts them with a single int64
    ``Xᵀ·X`` (exact: |fx| ≤ 1e6 so products ≤ 1e12 and per-partition
    sums sit far below 2⁶³; the earlier formulation exploded the
    same 64×64 products through nested interpreted ``transform``
    lambdas, 4096 struct constructions per row — measured 45 s at
    sf1 where this GEMM pass takes ~1 s) — so only (64²+65)·|tasks|
    rows ever shuffle; the corpus never re-partitions. The 4096-row
    C is localCheckpoint-ed once (it feeds 10 downstream references —
    without the cut, Catalyst would re-derive the corpus-sized Gram
    per reference); each 64-row iterate is a join+agg+window over C
    with single-reference lineage, so planning stays linear in
    steps. At 100 TB: one scan, one 4096-row shuffle, then
    driver-scale arithmetic."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")
    n_dims = 64

    def gram_parts(batches):
        G = np.zeros((n_dims, n_dims), dtype=np.int64)
        S = np.zeros(n_dims, dtype=np.int64)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Xi = np.floor(X * 1000000.0 + 0.5).astype(np.int64)
            G += Xi.T @ Xi
            S += Xi.sum(axis=0)
            n += len(Xi)
        ii, jj = np.meshgrid(
            np.arange(n_dims), np.arange(n_dims), indexing="ij"
        )
        yield pd.concat(
            [
                pd.DataFrame(
                    {"i": ii.ravel(), "j": jj.ravel(), "g": G.ravel()}
                ),
                pd.DataFrame(
                    {"i": np.arange(n_dims), "j": -1, "g": S}
                ),
                pd.DataFrame({"i": [-1], "j": [-1], "g": [n]}),
            ]
        )

    # split recovery: the fixture file carries few row groups (same
    # trade as q_sim_topk); with multi-split input this is a no-op
    parts = (
        e.select("embedding")
        .transform(split_recovery(spark, sf_dir, "embeddings"))
        .mapInPandas(gram_parts, "i int, j int, g long")
    )
    tot = parts.groupBy("i", "j").agg(F.sum("g").alias("g")).collect()
    # ^ 4161 rows, BOUNDED BY CONSTRUCTION (64² Gram cells + 64 sums
    # + 1 count, independent of corpus size) — the codebook-collect
    # pattern (same doctrine as IVF centroids). The 8 power-iteration
    # steps are 64-dim integer matrix-vector products; running them
    # as Spark jobs cost 17 sequential tiny-stage launches (~4 s of
    # pure scheduling at any sf) for arithmetic the driver does in
    # microseconds — EXACTLY (arbitrary-precision ints mirror the
    # oracle's HUGEINT state, with trunc-toward-zero renorm division).
    gm: dict[tuple[int, int], int] = {}
    sv: dict[int, int] = {}
    n_vecs = 0
    for r in tot:
        if r["i"] < 0:
            n_vecs = int(r["g"])
        elif r["j"] < 0:
            sv[r["i"]] = int(r["g"])
        else:
            gm[(r["i"], r["j"])] = int(r["g"])
    cm = [
        [n_vecs * gm[(i, j)] - sv[i] * sv[j] for j in range(n_dims)]
        for i in range(n_dims)
    ]
    v = [1000] * n_dims

    def tdiv(a: int, b: int) -> int:  # trunc toward zero (SQL div, //)
        q = abs(a) // b
        return -q if a < 0 else q

    for _k in range(_PCA_STEPS):
        w = [
            sum(cm[i][j] * v[j] for j in range(n_dims))
            for i in range(n_dims)
        ]
        m = max(abs(x) for x in w)
        v = [tdiv(x * 1000, m) for x in w]
    num = sum(
        v[i] * cm[i][j] * v[j]
        for i in range(n_dims)
        for j in range(n_dims)
    )
    den = sum(x * x for x in v)
    tr = sum(cm[i][i] for i in range(n_dims))
    top_dim = min(range(n_dims), key=lambda i: (-abs(v[i]), i))
    if n_dims != 64:  # fixture embedding width (docstring contract);
        # a raise, not assert — data guards must survive ``python -O``
        raise ValueError(f"expected 64-dim embeddings, got {n_dims}")

    # the rounding epilogue stays IN SPARK so decimal→double casts and
    # HALF_UP rounds match every other query's convention exactly
    from decimal import Decimal

    row = spark.createDataFrame(
        [
            (
                n_vecs,
                top_dim,
                v[top_dim],
                Decimal(num),
                Decimal(den),
                Decimal(tr),
            )
        ],
        "n bigint, top_dim int, top_loading_permille bigint,"
        " num decimal(38,0), den decimal(38,0), tr decimal(38,0)",
    )
    return row.select(
        F.col("n").cast("long").alias("n_vecs"),
        "top_dim",
        "top_loading_permille",
        F.round(
            F.col("num").cast("double")
            / F.col("den").cast("double")
            / F.col("n")
            / F.col("n")
            / F.lit(1e12),
            6,
        ).alias("lambda_variance"),
        F.round(
            F.col("num").cast("double")
            / F.col("den").cast("double")
            / F.col("tr").cast("double"),
            6,
        ).alias("variance_share"),
    )


# ---------------------------------------------------------------------------
# q_embed_isotropy — embedding-space anisotropy audit (round 6)
# ---------------------------------------------------------------------------


@register(
    "q_embed_isotropy",
    oracle="""
    WITH fx AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS d,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                  + 0.5) AS BIGINT) AS fp
      FROM embeddings
    ),
    sd AS (
      SELECT label, d, CAST(SUM(fp) AS BIGINT) AS s
      FROM fx GROUP BY 1, 2
    ),
    num AS (
      SELECT label, SUM(CAST(s AS HUGEINT) * s) AS ssq
      FROM sd GROUP BY 1
    ),
    den AS (
      SELECT label,
             CAST(count(*) // 64 AS BIGINT) AS n,
             SUM(CAST(fp AS HUGEINT) * fp) AS q
      FROM fx GROUP BY 1
    )
    SELECT num.label,
           den.n AS n_vecs,
           CAST(num.ssq * 1000 // (den.n * den.q) AS BIGINT)
             AS aniso_permille,
           round(sqrt(CAST(den.q AS DOUBLE) / den.n) / 1000000.0, 6)
             AS rms_norm
    FROM num JOIN den USING (label)
    """,
)
def q_embed_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy audit per label: ``‖μ‖² / E‖v‖²``
    in exact permille — THE health check for representation collapse
    ("all my embeddings point the same way"), the degenerate geometry
    that silently breaks cosine retrieval and clustering (an isotropic
    cloud scores ≈ 1/n; a collapsed one approaches 1000‰) — plus the
    RMS vector norm. Elements land on the module's 1e-6 fixed-point
    grid, so the mean-vector and second-moment sums are exact integers
    (the squares accumulate in decimal/HUGEINT: per-dimension sums
    square past int64 at ~10k vectors per label); the single sqrt is
    IEEE-correctly-rounded on identical inputs.

    Plan: one posexplode (rows × dims, codegen) feeding two
    map-combined aggregates — per-(label, dim) sums (|labels|·dims
    exchange rows) and per-label second moments (|labels| rows) — and
    a |labels|-row join. Nothing downstream of the explode exceeds
    |labels| × dims at any corpus size."""
    fx = (
        load(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("d", "v"))
        .select(
            "label",
            "d",
            F.floor(F.col("v").cast("double") * 1000000.0 + 0.5)
            .cast("long")
            .alias("fp"),
        )
    )
    sd = fx.groupBy("label", "d").agg(F.sum("fp").alias("s"))
    num = sd.groupBy("label").agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("ssq")
    )
    den = fx.groupBy("label").agg(
        F.expr("count(1) div 64").cast("long").alias("n"),
        F.sum(F.col("fp").cast("decimal(38,0)") * F.col("fp")).alias("q"),
    )
    return num.join(den, "label").select(
        "label",
        F.col("n").alias("n_vecs"),
        F.expr("CAST(ssq * 1000 div (n * q) AS BIGINT)").alias(
            "aniso_permille"
        ),
        F.round(
            F.sqrt(F.col("q").cast("double") / F.col("n")) / 1000000.0, 6
        ).alias("rms_norm"),
    )


# ---------------------------------------------------------------------------
# q_embed_pair_margin — class-separability audit (round 6)
# ---------------------------------------------------------------------------


@register(
    "q_embed_pair_margin",
    oracle="""
    WITH fx AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS d,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                  + 0.5) AS BIGINT) AS fp
      FROM embeddings
    ),
    sd AS (
      SELECT label, d, CAST(SUM(fp) AS BIGINT) AS s
      FROM fx GROUP BY 1, 2
    ),
    gd AS (SELECT d, CAST(SUM(s) AS BIGINT) AS gs FROM sd GROUP BY 1),
    nl AS (
      SELECT label,
             CAST(count(*) // 64 AS BIGINT) AS n,
             SUM(CAST(fp AS HUGEINT) * fp) AS q
      FROM fx GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM nl),
    dots AS (
      SELECT sd.label,
             SUM(CAST(sd.s AS HUGEINT) * sd.s) AS ss,
             SUM(CAST(sd.s AS HUGEINT) * (gd.gs - sd.s)) AS sc
      FROM sd JOIN gd USING (d) GROUP BY 1
    )
    SELECT nl.label,
           nl.n AS n_vecs,
           CAST((dots.ss - nl.q) // (CAST(nl.n AS HUGEINT) * (nl.n - 1))
                // 1000000 AS BIGINT) AS intra_dot_micro,
           CAST(dots.sc // (CAST(nl.n AS HUGEINT) * (tot.nt - nl.n))
                // 1000000 AS BIGINT) AS cross_dot_micro,
           CAST((dots.ss - nl.q) // (CAST(nl.n AS HUGEINT) * (nl.n - 1))
                // 1000000
                - dots.sc // (CAST(nl.n AS HUGEINT) * (tot.nt - nl.n))
                // 1000000 AS BIGINT) AS margin_micro
    FROM nl JOIN dots USING (label) CROSS JOIN tot
    WHERE nl.n > 1 AND tot.nt > nl.n
    """,
)
def q_embed_pair_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separability audit: per label, the mean pairwise dot
    product WITHIN the label vs the mean dot product to vectors of
    OTHER labels, and the margin between them — the Fisher-style
    "are my classes actually separated in embedding space" check
    behind classifier-probe sanity, hard-negative mining budgets, and
    SemDeDup cell quality. Computed WITHOUT any pairwise join: on the
    1e-6 fixed-point grid, Σ-of-pair-dots algebra reduces every mean
    to per-(label, dim) sums — intra = (‖S_l‖² − Σ‖v‖²)/(n_l(n_l−1)),
    cross = S_l·(S − S_l)/(n_l(n − n_l)) — all exact integers in
    decimal/HUGEINT. Pair sums can be NEGATIVE (embeddings are
    centered around zero), so the micro-unit division must truncate
    identically on both engines: Spark decimal ``div`` and DuckDB
    integer ``//`` both truncate toward zero (the q_supplier_hhi
    lore), and the margin subtracts the two already-truncated terms,
    so rounding can never diverge. Labels with a single vector are
    excluded on both sides (n(n−1) = 0 would divide by zero — an
    error in DuckDB but NULL in non-ANSI Spark, the one place the
    engines would disagree).

    Plan: one posexplode feeding the per-(label, dim) sums and the
    per-label second moments (the q_embed_isotropy frames), a 64-row
    global-dim broadcast join, and |labels|-row arithmetic. Nothing
    pairwise, nothing beyond |labels|×dims after the explode."""
    fx = (
        load(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("d", "v"))
        .select(
            "label",
            "d",
            F.floor(F.col("v").cast("double") * 1000000.0 + 0.5)
            .cast("long")
            .alias("fp"),
        )
    )
    dec = "decimal(38,0)"
    sd = fx.groupBy("label", "d").agg(F.sum("fp").alias("s"))
    sd = sd.localCheckpoint(eager=False)  # gd + dots reuse (tiny)
    gd = sd.groupBy("d").agg(F.sum("s").alias("gs"))
    nl = fx.groupBy("label").agg(
        F.expr("count(1) div 64").cast("long").alias("n"),
        F.sum(F.col("fp").cast(dec) * F.col("fp")).alias("q"),
    )
    tot = nl.agg(F.sum("n").cast("long").alias("nt"))
    dots = (
        sd.join(F.broadcast(gd), "d")
        .groupBy("label")
        .agg(
            F.sum(F.col("s").cast(dec) * F.col("s")).alias("ss"),
            F.sum(
                F.col("s").cast(dec) * (F.col("gs") - F.col("s"))
            ).alias("sc"),
        )
    )
    intra = F.expr(
        "CAST((ss - q) div (CAST(n AS DECIMAL(38,0)) * (n - 1)) "
        "div 1000000 AS BIGINT)"
    )
    cross = F.expr(
        "CAST(sc div (CAST(n AS DECIMAL(38,0)) * (nt - n)) "
        "div 1000000 AS BIGINT)"
    )
    return (
        nl.join(dots, "label")
        .crossJoin(F.broadcast(tot))
        .filter((F.col("n") > 1) & (F.col("nt") > F.col("n")))
        .select(
            "label",
            F.col("n").alias("n_vecs"),
            intra.alias("intra_dot_micro"),
            cross.alias("cross_dot_micro"),
            (intra - cross).alias("margin_micro"),
        )
    )


# ---------------------------------------------------------------------------
# q_embed_centroid_drift — embedding-distribution drift monitor (round 6)
# ---------------------------------------------------------------------------


@register(
    "q_embed_centroid_drift",
    oracle="""
    WITH fx AS (
      SELECT label,
             CAST(vec_id % 2 AS BIGINT) AS half,
             generate_subscripts(embedding, 1) AS d,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                  + 0.5) AS BIGINT) AS fp
      FROM embeddings
    ),
    sd AS (
      SELECT label, half, d,
             CAST(SUM(fp) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS nr
      FROM fx GROUP BY 1, 2, 3
    ),
    w AS (
      SELECT a.label, a.d,
             a.s AS s0, b.s AS s1, a.nr AS n0, b.nr AS n1
      FROM (SELECT * FROM sd WHERE half = 0) a
      JOIN (SELECT * FROM sd WHERE half = 1) b
        ON a.label = b.label AND a.d = b.d
    ),
    agg AS (
      SELECT label,
             any_value(n0) AS n0, any_value(n1) AS n1,
             SUM(CAST(s0 AS HUGEINT) * s1) AS dot01,
             SUM(CAST(s0 AS HUGEINT) * s0) AS dot00,
             SUM(CAST(s1 AS HUGEINT) * s1) AS dot11
      FROM w GROUP BY 1
    )
    SELECT label,
           n0 AS n_even, n1 AS n_odd,
           round(CAST(dot01 AS DOUBLE)
                 / (sqrt(CAST(dot00 AS DOUBLE))
                    * sqrt(CAST(dot11 AS DOUBLE))), 6)
             AS centroid_cosine
    FROM agg WHERE dot00 > 0 AND dot11 > 0
    """,
)
def q_embed_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per label, the cosine
    between the centroid of one corpus half and the centroid of the
    other (halves split deterministically by vec_id parity — in
    production, by ingestion batch or date). A cosine near 1 means
    the label's embedding distribution is stable across the split; a
    drop is the upstream-encoder-changed / population-shift alarm
    that silently degrades every ANN index and classifier probe built
    on the column — the embedding-space sibling of q_text_kl_drift's
    vocabulary test. Centroid COSINE is scale-invariant, so the
    per-half mean division cancels and the whole statistic reduces to
    per-(label, half, dim) fixed-point sums: cos = S0·S1/(‖S0‖‖S1‖).
    Sums are exact integers on the 1e-6 grid (HUGEINT/decimal cross
    terms); the two sqrts and one division are single IEEE ops on
    identical doubles, rounded at 1e-6 (the libm convention).
    Degenerate all-zero halves are excluded identically on both
    engines.

    Plan: one posexplode feeding a per-(label, half, dim) sum
    (|labels|·2·dims exchange rows), a co-keyed self-pair on
    (label, dim), and a |labels|-row rollup. Nothing downstream of
    the explode exceeds |labels|×dims at any corpus size."""
    fx = (
        load(spark, sf_dir, "embeddings")
        .select(
            "label",
            (F.col("vec_id") % 2).cast("bigint").alias("half"),
            F.posexplode("embedding").alias("d", "v"),
        )
        .select(
            "label",
            "half",
            "d",
            F.floor(F.col("v").cast("double") * 1000000.0 + 0.5)
            .cast("long")
            .alias("fp"),
        )
    )
    sd = (
        fx.groupBy("label", "half", "d")
        .agg(F.sum("fp").alias("s"), F.count(F.lit(1)).alias("nr"))
        .localCheckpoint(eager=False)  # both half-slices read it
    )
    dec = "decimal(38,0)"
    a = sd.filter(F.col("half") == 0).select(
        "label", "d", F.col("s").alias("s0"), F.col("nr").alias("n0")
    )
    b = sd.filter(F.col("half") == 1).select(
        "label", "d", F.col("s").alias("s1"), F.col("nr").alias("n1")
    )
    agg = (
        a.join(b, ["label", "d"])
        .groupBy("label")
        .agg(
            F.first("n0").alias("n_even"),
            F.first("n1").alias("n_odd"),
            F.sum(F.col("s0").cast(dec) * F.col("s1")).alias("dot01"),
            F.sum(F.col("s0").cast(dec) * F.col("s0")).alias("dot00"),
            F.sum(F.col("s1").cast(dec) * F.col("s1")).alias("dot11"),
        )
    )
    return agg.filter((F.col("dot00") > 0) & (F.col("dot11") > 0)).select(
        "label",
        "n_even",
        "n_odd",
        F.round(
            F.col("dot01").cast("double")
            / (
                F.sqrt(F.col("dot00").cast("double"))
                * F.sqrt(F.col("dot11").cast("double"))
            ),
            6,
        ).alias("centroid_cosine"),
    )
