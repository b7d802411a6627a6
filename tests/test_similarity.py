"""Trained-quantizer IVF (queries/similarity.py): on well-separated
planted clusters the k-means coarse quantizer must recover the cluster
structure, and probe-1 IVF top-k must equal brute-force top-k
(recall@k = 1.0 when true neighbors share the query's cluster)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from codegraph_spark.queries.similarity import (
    assign_ivf,
    cosine,
    train_ivf_kmeans,
    sim_ivf_kmeans,
)

D = 8          # dims
PER_CLUSTER = 30


@pytest.fixture(scope="module")
def clusters(spark):
    """3 orthogonal clusters: cluster c concentrates on axis 2c with a
    small deterministic off-axis wobble — cosine within a cluster is
    ~1, across clusters ~0."""
    rows = []
    for c in range(3):
        for i in range(PER_CLUSTER):
            v = [0.0] * D
            v[2 * c] = 10.0
            v[(2 * c + 1) % D] = (i % 7) * 0.1   # wobble, deterministic
            rows.append((c * PER_CLUSTER + i, v, f"c{c}"))
    return spark.createDataFrame(
        rows, "vec_id long, v array<double>, label string"
    ).persist()


def test_kmeans_recovers_planted_clusters(clusters):
    cents = train_ivf_kmeans(clusters, k=3, iters=3)
    assert cents.count() == 3
    inv = assign_ivf(clusters, cents)
    # every planted cluster maps to exactly one learned cluster id
    purity = (
        inv.withColumn("planted", F.col("label"))
        .groupBy("planted")
        .agg(F.countDistinct("cluster").alias("k"))
    )
    assert {r["k"] for r in purity.collect()} == {1}
    # and the mapping is injective (3 distinct learned ids)
    assert inv.select("cluster").distinct().count() == 3


def test_ivf_probe_matches_bruteforce_on_separated_clusters(clusters):
    cents = train_ivf_kmeans(clusters, k=3, iters=3)
    inv = assign_ivf(clusters, cents)
    q = inv.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("cluster").alias("probe"),
    )
    scored = inv.join(
        F.broadcast(q),
        (F.col("cluster") == F.col("probe")) & (F.col("vec_id") != F.col("q_id")),
    ).withColumn("cos", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    ivf_top = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id")
    )

    allp = clusters.alias("a").join(
        F.broadcast(clusters.filter(F.col("vec_id") < 3).alias("qq")),
        F.col("a.vec_id") != F.col("qq.vec_id"),
    ).withColumn("cos", cosine(F.col("qq.v"), F.col("a.v")))
    wb = Window.partitionBy("qq.vec_id").orderBy(F.desc("cos"), "a.vec_id")
    brute_top = (
        allp.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= 5)
        .select(F.col("qq.vec_id").alias("q_id"), F.col("a.vec_id").alias("vec_id"))
    )
    got = {(r["q_id"], r["vec_id"]) for r in ivf_top.collect()}
    want = {(r["q_id"], r["vec_id"]) for r in brute_top.collect()}
    assert got == want  # recall@5 == 1.0 on separated clusters


def test_sim_ivf_kmeans_runs_on_fixture(spark, sf_dir):
    out = sim_ivf_kmeans(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 15  # 3 queries x top-5
    assert out.columns == ["q_id", "probe_cluster", "neighbor_id", "cosine", "rn"]


def test_lsh_plane_count_controls_candidate_volume(spark, sf_dir):
    """The log(n)-planes scale remedy: raising the plane count must cut
    the candidate-pair volume sharply (~2x per extra plane for
    near-uniform buckets) while every surviving pair still shares a
    full signature."""
    from codegraph_spark.queries.similarity import lsh_candidate_pairs
    from codegraph_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n8 = lsh_candidate_pairs(emb, 8).count()
    n12 = lsh_candidate_pairs(emb, 12).count()
    assert n12 < n8 / 2, (n8, n12)


def test_lsh_planes_scale_with_corpus_size():
    """lsh_planes_for: log2-growth with NO reachable ceiling — the knob
    that keeps same-bucket candidate volume linear in n (SCALE.md r4
    finding; the r5 16-plane clamp made the family constant — and the
    self-join quadratic — past ~2M vectors, r5 VERDICT item 1)."""
    from codegraph_spark.queries.similarity import lsh_planes_for

    assert lsh_planes_for(1) == 4            # clamp floor
    assert lsh_planes_for(500) == 4
    assert lsh_planes_for(2000) == 6
    assert lsh_planes_for(20000) == 10       # 10x data -> +3..4 planes
    assert lsh_planes_for(4 * 10**6) == 17   # past the old 16 ceiling
    assert lsh_planes_for(10**9) == 25       # keeps tracking log2(n)
    assert lsh_planes_for(10**12) == 35      # ~100 TB of embeddings
    for small, big in [(100, 1000), (1000, 100000), (10**6, 10**9)]:
        assert lsh_planes_for(small) <= lsh_planes_for(big)


def _synthetic_embeddings(spark, n: int, dim: int = 24):
    """Deterministic well-spread corpus: component d of vector i is a
    hash-derived value in [-0.5, 0.5) — no Date.now/random, stable
    across runs and engines."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            f"d -> (pmod(hash(id * {dim} + d), 1000) - 500) / 1000.0)"
        ).alias("embedding"),
    )


def _banded_candidate_volume(spark, n: int) -> int:
    """Candidate-pair volume of the corpus-adaptive banded family at
    corpus size n, from the REAL bucket table's histogram (the exact
    per-band self-join output size, no pair materialization)."""
    from codegraph_spark.queries.similarity import (
        _LSH_BANDS,
        lsh_bucket_histogram_volume,
        lsh_planes_for,
    )

    emb = _synthetic_embeddings(spark, n)
    return lsh_bucket_histogram_volume(emb, lsh_planes_for(n), bands=_LSH_BANDS)


def test_lsh_candidates_stay_linear_past_plane_ceiling(spark):
    """r5 VERDICT item 1 'done' criterion: candidate count ~linear at a
    synthetic n >= 1e6. Two pins, both at the corpus-adaptive family:

    1. LINEARITY: growing the corpus 8x (2^17 -> 2^20 vectors) must
       leave candidates-per-row near-flat (< 3x; a family whose plane
       count stopped tracking log2(n) grows it by the full data
       ratio, 8x). The synthetic hash corpus is low-dimensional (24),
       so bucket occupancy is deliberately skewed — the bound is on
       GROWTH, not the absolute constant.
    2. CEILING REMOVAL: at n = 2^20 the adaptive family (15 planes)
       must produce far fewer candidates than the same family clamped
       three steps lower (12 planes — simulating the r5 ceiling two
       doublings past its bind point). Each tracked plane halves
       per-bucket occupancy, so the gap must be >= 4x.

    SCALE.md records the companion probe at n = 2^23 (planes = 18,
    past the old 16-ceiling) — too slow for the suite."""
    from codegraph_spark.queries.similarity import (
        _LSH_BANDS,
        lsh_bucket_histogram_volume,
        lsh_planes_for,
    )

    n1, n2 = 1 << 17, 1 << 20
    assert n2 >= 10**6
    c1 = _banded_candidate_volume(spark, n1)
    c2 = _banded_candidate_volume(spark, n2)
    r1, r2 = c1 / n1, c2 / n2
    assert r2 < r1 * 3, f"candidate growth superlinear: {r1:.1f} -> {r2:.1f}"

    clamped = lsh_bucket_histogram_volume(
        _synthetic_embeddings(spark, n2), 12, bands=_LSH_BANDS
    )
    assert lsh_planes_for(n2) == 15
    assert c2 * 4 <= clamped, (
        f"adaptive {c2} vs clamped-12 {clamped}: ceiling removal "
        "did not cut candidate volume"
    )


def test_lsh_recall_audit_shape_and_signal(spark, sf_dir):
    """sim_lsh_recall: one row per sampled probe, hits bounded by k,
    and the banded family actually recovers a nonzero share of true
    neighbors (the audit is non-vacuous). Exactness vs the DuckDB
    oracle is covered by test_oracle_parity."""
    from pyspark.sql import functions as F

    from codegraph_spark.queries.similarity import (
        _RECALL_K,
        _recall_mod_for,
        sim_lsh_recall,
    )
    from codegraph_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mod = _recall_mod_for(emb.count())
    n_probes = emb.filter(F.col("vec_id") % mod == 0).count()
    out = sim_lsh_recall(spark, sf_dir).collect()
    assert len(out) == n_probes
    assert all(0 <= r.n_hits <= _RECALL_K for r in out)
    assert sum(r.n_hits for r in out) > 0


def test_recall_probe_sample_is_bounded():
    """_recall_mod_for: the probe count (~n/stride) stays ~constant at
    any corpus size — a fixed-fraction sample would grow the non-equi
    broadcast with data (the plan doctor's unkeyed-broadcast-join
    warning that motivated the stride)."""
    from codegraph_spark.queries.similarity import _recall_mod_for

    assert _recall_mod_for(0) == 64
    assert _recall_mod_for(65536) == 64
    for n in (10**6, 10**9, 10**12):
        mod = _recall_mod_for(n)
        assert mod & (mod - 1) == 0  # power of two (oracle pow(2,k) exact)
        assert n / mod <= 2048       # bounded probe sample
        assert n / mod >= 512        # and non-vacuous


def test_lsh_family_null_embeddings_match_oracle(spark, tmp_path_factory):
    """Round-6 review regression: rows with NULL embeddings used to
    land in the all-zeros Spark LSH bucket while the oracle's
    unnest-based dots CTE silently dropped them — phantom candidate
    pairs on exactly the input the dim peek guards. Both engines now
    exclude NULL-embedding rows (and size the plane family from the
    non-null count); parity must hold on a corpus containing them."""
    import os

    import duckdb

    from codegraph_spark.queries import collect
    from codegraph_spark.sources.tables import load_table
    from tests.conftest import TEST_SF_DIR
    from tests.test_oracle_parity import _normalize

    d = str(tmp_path_factory.mktemp("sf_null_emb"))
    emb = load_table(spark, TEST_SF_DIR, "embeddings").limit(120)
    (
        emb.select(
            "vec_id",
            F.when(F.col("vec_id") % 5 == 0, F.lit(None))
            .otherwise(F.col("embedding")).alias("embedding"),
            "label",
        )
        .coalesce(1).write.mode("overwrite")
        .parquet(os.path.join(d, "embeddings.parquet"))
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'embeddings.parquet')}/*.parquet')"
    )
    queries, oracles = collect()
    try:
        for name in ("sim_lsh_cosine", "sim_lsh_recall"):
            spark_pd = queries[name](spark, d).toPandas()
            duck_pd = con.execute(oracles[name]).fetchdf()
            cols = sorted(spark_pd.columns)
            assert cols == sorted(duck_pd.columns), name
            assert _normalize(spark_pd, cols) == _normalize(duck_pd, cols), name
    finally:
        con.close()


def test_dedup_semantic_prunes_every_clone_to_its_source(spark, sf_dir):
    """Every planted clone (vec_id+1M, identical vector) must appear as
    a pruned row whose keeper is its source at cosine 1.0, in the
    source's cluster — and no un-cloned natural pair may cross the 0.9
    threshold on the random fixture (max natural cosine ~0.47)."""
    from codegraph_spark.queries.similarity import (
        _trained_inverted_file,
        dedup_semantic,
    )

    out = dedup_semantic(spark, sf_dir)
    rows = {r["pruned_id"]: r for r in out.collect()}
    inv = {
        r["vec_id"]: r["cluster"]
        for r in _trained_inverted_file(spark, sf_dir).collect()
    }
    clone_ids = [v + 1_000_000 for v in inv if v % 40 == 0]
    assert clone_ids, "fixture must plant at least one clone"
    assert set(rows) == set(clone_ids)  # all clones pruned, nothing else
    for cid in clone_ids:
        r = rows[cid]
        assert r["kept_id"] == cid - 1_000_000
        assert r["cosine"] == 1.0
        assert r["cluster"] == inv[cid - 1_000_000]


def test_semantic_dedup_pair_volume_stays_linear_with_adaptive_k(spark):
    """dedup_semantic's scale contract: with k tracking corpus size
    (k = n / occupancy), the within-cluster candidate-pair volume
    Σ C(|cluster|, 2) stays ~linear in n — pairs-per-row bounded by a
    small multiple of the occupancy target — instead of the n²/k
    growth a fixed k would give. Measured from the real trained
    quantizer's cluster histogram (no pair materialization)."""
    from codegraph_spark.queries.similarity import assign_ivf, train_ivf_kmeans

    occupancy = 128
    per_row = {}
    for n in (1024, 4096):
        emb = _synthetic_embeddings(spark, n, dim=16).select(
            "vec_id", F.col("embedding").alias("v")
        )
        k = max(8, n // occupancy)
        cents = train_ivf_kmeans(emb, k=k, iters=1)
        sizes = assign_ivf(emb, cents).groupBy("cluster").count().collect()
        pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
        per_row[n] = pairs / n
    # k-means on a well-spread corpus is not perfectly balanced; allow
    # generous imbalance but pin the SHAPE: pairs-per-row must not grow
    # with n (fixed k would multiply it ~4x here) and must stay within
    # a small multiple of the occupancy target.
    assert per_row[4096] <= 2.0 * per_row[1024]
    assert per_row[4096] <= 4 * occupancy


def test_dedup_semantic_adaptive_gate_shape_and_output(spark, sf_dir):
    """The r10 production-plan gate: adaptive k (ceil(n/4) = 125 at the
    500-vector fixture) must resolve the assign_ivf_auto dispatch to
    the Arrow flat-argmax kernel (the same kernel a 100 TB run uses
    below the two-level threshold), and the pruned set must be exactly
    the planted clones, each kept by its source at cosine 1.0.

    r12: the assignment output is localCheckpointed (one kernel
    execution serves its three consumers), which truncates the final
    plan at the checkpoint barrier — so the kernel dispatch is pinned
    on the POLICY (the same pure function assign_ivf_auto branches on,
    over the fixture's exact k and d) plus the checkpoint scan in the
    plan, and the planted-clone output pins the kernel's execution."""
    from codegraph_spark import doctor
    from codegraph_spark.queries.similarity import (
        _IVF_BNLJ_MAX_K,
        _assignment_strategy,
        _emb,
        dedup_semantic_adaptive,
    )

    n = _emb(spark, sf_dir).count()
    k = max(1, -(-n // 4))
    assert k > _IVF_BNLJ_MAX_K  # past the JVM BNLJ regime...
    d = len(_emb(spark, sf_dir).first()["v"])
    assert _assignment_strategy(k, d) == "flat"  # ...the Arrow kernel
    df = dedup_semantic_adaptive(spark, sf_dir)
    plan = doctor.plan_text(df)
    # the checkpointed assignment appears as an RDD scan barrier
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert "CartesianProduct" not in plan
    rows = {r["pruned_id"]: r for r in df.collect()}
    clone_ids = {v + 1_000_000 for v in range(0, 500, 40)}
    assert set(rows) == clone_ids
    for cid in clone_ids:
        assert rows[cid]["kept_id"] == cid - 1_000_000
        assert rows[cid]["cosine"] == 1.0


def test_sampled_trainer_plus_auto_dispatch_production_path(spark, sf_dir):
    """The full production composition the adaptive gate decomposes
    (gate: exact-rule centroids + auto-dispatch + prune; here: the
    REAL sampled Lloyd trainer feeding the same dispatch at the same
    adaptive k): identical vectors co-assign deterministically (clone
    inherits source cluster through the kernel, not by construction)
    and the within-cluster pair volume stays at occupancy scale —
    linear in n, the SemDeDup scale contract."""
    from codegraph_spark.queries.similarity import (
        _emb,
        assign_ivf_auto,
        plant_clones,
        train_ivf_kmeans_sampled,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "v")
    n = emb.count()
    k = max(1, -(-n // 4))
    assert k > 64  # the flat Arrow-kernel regime of the dispatch table
    cents = train_ivf_kmeans_sampled(emb, k=k, iters=4)
    assert cents.count() == k
    assigned = assign_ivf_auto(plant_clones(emb, "vec_id"), cents)
    a = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    for v in range(0, n, 40):
        assert a[v + 1_000_000] == a[v]
    sizes: dict[int, int] = {}
    for c in a.values():
        sizes[c] = sizes.get(c, 0) + 1
    pairs = sum(s * (s - 1) // 2 for s in sizes.values())
    assert pairs / len(a) <= 16 * 4  # pairs-per-row bounded by O(occupancy)


# --- PQ (product quantization) ------------------------------------------------


def test_pq_codes_and_codebook_shapes(spark, sf_dir):
    from codegraph_spark.queries.similarity import (
        _PQ_K,
        _PQ_SUBDIM,
        _PQ_SUBS,
        _emb,
        _pq_assign,
        _pq_subvectors,
        _train_pq,
    )

    emb = _emb(spark, sf_dir)
    n = emb.count()
    sv = _pq_subvectors(emb).persist()
    cents = _train_pq(sv).persist()
    # full codebook: m x k integer codewords of sub-dimension length
    crows = cents.collect()
    assert len(crows) == _PQ_SUBS * _PQ_K
    assert all(len(r["cv"]) == _PQ_SUBDIM for r in crows)
    assert all(isinstance(x, int) for r in crows for x in r["cv"])
    # every vector gets exactly one code per subspace
    codes = _pq_assign(sv, cents)
    per_vec = codes.groupBy("vec_id").count().collect()
    assert len(per_vec) == n
    assert {r["count"] for r in per_vec} == {_PQ_SUBS}
    cents.unpersist()
    sv.unpersist()


def test_pq_adc_ranking_tracks_exact_dot(spark, sf_dir):
    """ADC is lossy (24 bits/vector on an ISOTROPIC corpus — exact
    top-5 recall is not attainable), so assert the property the
    compression CAN give and a broken LUT join or codebook cannot
    fake: per query, the best ADC pick sits in the exact-dot top-10 of
    the probed posting list, and across all picks the mean exact rank
    beats the random-pick expectation by ≥ ~2x (rank sum ≤ 0.35 x
    posting mass). Deterministic: observed ranks at sf0.001 are
    [2,7,24,26,29] / [2,6,10,29,41] / [2,3,11,12,18]."""
    from codegraph_spark.queries.similarity import (
        _emb,
        _int_dot,
        _milli_arr,
        _trained_inverted_file,
        sim_ivf_pq,
    )

    got = sim_ivf_pq(spark, sf_dir).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["neighbor_id"])

    inv = _trained_inverted_file(spark, sf_dir)
    mq = _emb(spark, sf_dir).select("vec_id", _milli_arr(F.col("v")).alias("m"))
    base = inv.join(mq, "vec_id").select("vec_id", "cluster", "m")
    q = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("cluster").alias("probe"),
        F.col("m").alias("qm"),
    )
    exact = (
        base.join(
            F.broadcast(q),
            (F.col("cluster") == F.col("probe")) & (F.col("vec_id") != F.col("q_id")),
        )
        .withColumn("dot", _int_dot(F.col("qm"), F.col("m")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), "vec_id")
    ranked = (
        exact.withColumn("rn", F.row_number().over(w))
        .select("q_id", "vec_id", "rn")
        .collect()
    )
    rank_of: dict[int, dict[int, int]] = {}
    posting: dict[int, int] = {}
    for r in ranked:
        rank_of.setdefault(r["q_id"], {})[r["vec_id"]] = r["rn"]
        posting[r["q_id"]] = posting.get(r["q_id"], 0) + 1
    assert set(by_q) == set(rank_of)
    rank_sum = post_sum = 0
    for qid, approx in by_q.items():
        ranks = sorted(rank_of[qid][v] for v in approx)
        assert ranks[0] <= 10, (qid, ranks)
        rank_sum += sum(ranks)
        post_sum += len(approx) * posting[qid]
    assert rank_sum * 100 <= 35 * post_sum, (rank_sum, post_sum)


def test_pca_power_recovers_planted_direction(spark):
    """Vectors = strong fixed direction + small deterministic per-dim
    wobble: the returned dominant component must align with the
    planted direction (|cosine| > 0.95) and carry a Rayleigh estimate
    >> the wobble's."""
    import math

    from codegraph_spark.queries import similarity as S

    d = S._PCA_DIM
    base = [math.sin(0.1 * (j + 1)) for j in range(d)]
    nb = math.sqrt(sum(x * x for x in base))
    base = [x / nb for x in base]
    rows = []
    for i in range(200):
        scale = 1.0 + (i % 5) * 0.01
        v = [scale * x for x in base]
        v[i % d] += 0.02 * ((i % 3) - 1)  # wobble
        rows.append((i, v, 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")

    import codegraph_spark.sources.tables as T

    orig = T.load_table
    try:
        T.load_table = lambda sp, sf, name: emb  # noqa: ARG005
        S.load_table = T.load_table
        out = S.emb_pca_power(spark, "ignored").collect()
    finally:
        T.load_table = orig
        S.load_table = orig
    assert len(out) == d
    comp = [r["comp_milli"] for r in sorted(out, key=lambda r: r["dim"])]
    nc = math.sqrt(sum(x * x for x in comp))
    cos = abs(sum(c * b for c, b in zip(comp, base)) / nc)
    assert cos > 0.95, cos
    assert out[0]["rayleigh_milli"] > 0
