"""Structural invariants of the driver-facing registry.

The driver grades the first 50 entries of queries() in GRADE_PRIORITY
order; a malformed priority list (duplicate names, names that silently
miss the registry, registry entries forgotten from the list) degrades
grading without any query failing. Pin the structure.
"""

from time_sift_spark.queries import GRADE_PRIORITY, REGISTRY, oracle_sql, queries


def test_priority_has_no_duplicates():
    assert len(GRADE_PRIORITY) == len(set(GRADE_PRIORITY))


def test_priority_names_all_registered():
    missing = [n for n in GRADE_PRIORITY if n not in REGISTRY]
    assert not missing, f"GRADE_PRIORITY names not in REGISTRY: {missing}"


def test_every_registered_query_is_prioritized():
    # relying on the implicit append hides new queries at the tail,
    # outside the graded window — list them deliberately instead
    unlisted = [n for n in REGISTRY if n not in set(GRADE_PRIORITY)]
    assert not unlisted, f"registered but not in GRADE_PRIORITY: {unlisted}"


def test_queries_and_oracles_align():
    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs)
    # every registered query is oracle-checkable (ewma_events gained a
    # recursive-CTE oracle in r6 — no rows-only exceptions remain)
    assert set(qs) - set(os_) == set()


def test_oracles_are_valid_duckdb_sql():
    """Every oracle must at least PLAN on DuckDB against the real tables —
    catches dialect typos before the driver does (prepare-only, no
    execution, so the whole registry checks in seconds)."""
    import os

    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for name, sql in oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"oracle for {name!r} does not plan: {exc}") from exc


def _full_plan_string(df) -> str:
    """executedPlan().toString() with expression-tree truncation OFF for
    the duration of the render: the default
    spark.sql.debug.maxToStringFields=25 elides long condition lists
    ('... N more fields'), so a smoking-gun expression buried deep in a
    Filter condition could vanish from the printed plan and a regex gate
    would silently pass (ADVICE r14)."""
    spark = df.sparkSession
    key = "spark.sql.debug.maxToStringFields"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "100000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_staged_plan_exchange_counts_pinned(spark):
    """Plan-shape regression gate for the r9 staging wins (VERDICT item:
    a Catalyst-inlining regression should fail pytest, not surface as a
    bench diff).  Catalyst inlines temp views/CTEs per reference, so the
    staged shared frames (lazy localCheckpoint) are what keep these
    shuffle counts down — unstaged, the trio measured 15 exchanges, KMV
    12, Theil-Sen 4.  Counts are ceilings on the EXECUTED plan's
    hash-partitioning exchanges at sf0.001 (structure, not data, decides
    them)."""
    import re

    from time_sift_spark.queries import REGISTRY

    SF = "/root/testdata/sf0.001"
    ceilings = {
        "calibration_quality_docs": 1,
        "brier_quality_docs": 3,
        "quality_auc_docs": 1,
        "theil_sen_trend_events": 1,   # ONE data shuffle (staged buckets)
        "kmv_audience_overlap_lineitem": 4,
        # r13 rewrite (sf1 fix): staged tokens+wins checkpoints, then
        # flagged-gram hash stats [1 exchange] + stats join-back [1,
        # AQE-broadcast at runtime] + per-doc removal aggregate [1] —
        # one more hash exchange than the r11 window form but NO
        # corpus-wide sort and a single tokenize pass (2.8s vs 8.97
        # record at sf0.1; 6.7x vs 16x at the sf1 10x probe)
        "substring_remove_docs": 3,
        # r9 staging kept for the conformal/attribution shared frames
        "attribution_revenue_events": 2,
        "conformal_interval_events": 3,
        "robust_scale_sketch_events": 2,
        # r10 staging wins, pinned in r11 (VERDICT item 8) at the
        # counts measured from the executed plans — a Catalyst-
        # inlining regression on the staged centroid/eval, funnel
        # chain, basket-pair, prefix-hdist, or fingerprint frames
        # fails here before it surfaces as a bench diff
        "centroid_classifier_labels": 4,
        "funnel_latency_quantiles": 2,
        "item_similarity_lineitem": 1,
        "prefix_jaccard_join_docs": 8,
        "winnow_pairs_docs": 1,
        # r11 rewrites/additions
        "symspell_match_capped_customer": 3,
        # one series-key exchange + one for the planted-union day
        # bucketing (the UNION ALL source re-partitions by (k, day))
        "holt_winters_mul_events": 2,
        # aliased-key window so the reassembly groupBy reuses the rank
        # partitioning (was 3 before the alias fix)
        "top_paths_events": 2,
        "classical_decompose_events": 2,
        "spearman_matrix_events": 1,
        # r12 additions: ceilings at the measured executed-plan counts
        # (staged frames where a shared CTE would replan per reference:
        # logrank's subject reduction, MK/pettitt/theta buckets, AMS
        # frequencies — unstaged they measured 16/12/4/9/10)
        "logrank_events": 8,
        "mann_kendall_events": 6,
        "pettitt_events": 2,
        "ams_f2_users_by_type": 6,
        "theta_forecast_events": 4,
        "session_paths_events": 4,
        "ks_drift_events": 4,
        "croston_events": 4,
        "hampel_filter_events": 2,
        "phrase_search_docs": 6,
        "prop_ztest_events": 2,
        "regression_report_events": 6,
        "season_detect_events": 4,
        "holt_winters_forecast_events": 4,
        # r12 in-round additions: ceilings at the measured executed-plan
        # counts (the staged strip/signature frames are what keep the
        # html chain at 3 and the simhash band join at 1)
        "html_extract_docs": 3,
        "pipeline_html_quality_docs": 3,
        "html_links_docs": 0,
        "html_inlink_counts_docs": 2,
        "ks_drift_binned_events": 2,
        "hw_two_season_events": 3,
        "simhash_neardup_docs": 1,
    }
    bad = []
    for name, cap in ceilings.items():
        plan = _full_plan_string(REGISTRY[name].spark_fn(spark, SF))
        n = len(re.findall(r"Exchange hashpartitioning", plan))
        if n > cap:
            bad.append(f"{name}: {n} hash exchanges > pinned ceiling {cap}")
    assert not bad, "; ".join(bad)


def test_no_tokenizer_in_scan_filters(spark):
    """Plan-shape regression gate for the r14 raw-column-guard sweep: a
    `_toks IS NOT NULL` (or `size(_toks) >= 1`) guard written above the
    tokenizing projection gets pushed into the scan Filter by Catalyst
    with the whole tokenizer inlined — every row then tokenizes twice
    (Filter + Project) at scan parallelism.  The r14 fix moves the
    guards to the raw text column (`tokens(x) IS NULL ⇔ x IS NULL`;
    `size(tokens(x)) >= 1 ⇔ lower(x) RLIKE '[a-z0-9]'`).  Pin the
    invariant on the executed plans of one representative per touched
    family, plus the staged relations whose registered plans only show
    a checkpoint read."""
    SF = "/root/testdata/sf0.001"
    # `filter(split(lower(` inside a Filter condition is the smoking gun
    # (the projection legitimately contains it once).
    import re

    gun = re.compile(r"Filter [^\n]*filter\(split\(lower\(")
    bad = []
    for name in (
        "minhash_sigs_docs",            # _minhash_sig_cte consumers
        "dedup_incremental_fuzzy_docs",  # persisted fuzzy screen
        "simhash_docs",                 # direct token explode
        "keywords_docs",                # keyword_extract OUTER form
        "readability_docs",             # raw-column guard
        "hash_vectorize_docs",          # raw-column guard
        "token_chisq_docs",             # OUTER form (tot counts base)
        "gini_feature_select_docs",     # OUTER form (nl counts base)
        "decontaminate_docs",           # both sides raw-guarded
    ):
        plan = _full_plan_string(REGISTRY[name].spark_fn(spark, SF))
        if gun.search(plan):
            bad.append(name)
    # staged relations (registered plans read localCheckpoints, so pin
    # the staging statement's own plan)
    from time_sift_spark.functions.text_fns import SPARK as _TS
    from time_sift_spark.operators.entity import _symspell_variants_select
    from time_sift_spark.operators.search import _tfc_weights_select

    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView(
        "_ts_inv_docs"
    )
    spark.read.parquet(f"{SF}/customer.parquet").createOrReplaceTempView(
        "_ts_inv_cust"
    )
    w = spark.sql(_tfc_weights_select(
        _TS, "_ts_inv_docs", "doc_id", "text", shingle_k=3, pair_df_cap=64
    ))._jdf.queryExecution().executedPlan().toString()
    if gun.search(w):
        bad.append("_tfc_weights_select")
    v = _full_plan_string(spark.sql(_symspell_variants_select(
        _TS, "_ts_inv_cust", "c_custkey", "c_name", max_deletions=2
    )))
    # the variants gun is the neighborhood transform inside a Filter
    if re.search(r"Filter [^\n]*transform\(sequence\(", v):
        bad.append("_symspell_variants_select")
    assert not bad, f"tokenizer/neighborhood re-evaluated in scan Filter: {bad}"


def test_no_lsh_fold_in_scan_filters(spark):
    """Plan-shape gate for the r14 LSH fix (VERDICT r14 item 8): a plain
    ``explode(bks)`` over the literal-constructed bucket-key array makes
    Catalyst infer ``size(array(<num_tables×num_planes plane-dot
    folds>)) > 0`` and push it below the Exchange into the scan-side
    Filter — every LSH key fold then runs TWICE per row (Filter +
    Project).  The LATERAL VIEW OUTER form kills the inferred
    constraint; pin it on one representative per consumer family."""
    import re

    SF = "/root/testdata/sf0.001"
    gun = re.compile(r"Filter [^\n]*size\(array\(")
    bad = []
    for name in (
        "ann_lsh_topk",              # inline two-sided keys
        "vector_screen_embeddings",  # persisted screen (batch signing)
        "ann_lsh_multiprobe_topk",   # multiprobe probe side
    ):
        plan = _full_plan_string(REGISTRY[name].spark_fn(spark, SF))
        if gun.search(plan):
            bad.append(name)
    assert not bad, f"LSH key folds re-evaluated in scan Filter: {bad}"


def test_staged_trainer_centroid_joins_broadcast(spark):
    """Plan-shape gate for the r14 staged-trainer broadcast pins
    (VERDICT r14 item 8): the staged Lloyd/PQ relations are
    localCheckpoint'ed, and checkpointed frames carry no size stats
    (LogicalRDD defaults to 'huge') — without the F.broadcast pin every
    centroid/codebook join demotes to a shuffle, which measured SLOWER
    than the unstaged inline form.  Pin the join strategy on the
    executed plans: the K-row centroid relations must reach the n×K
    rankings as broadcasts (BroadcastNestedLoopJoin for the cross
    joins, BroadcastHashJoin for the subspace equi-joins), never as a
    SortMergeJoin/ShuffledHashJoin build side."""
    import re

    SF = "/root/testdata/sf0.001"
    for name, pattern in (
        # lv CROSS JOIN c{final} (assign + probes): broadcast NLJ
        ("ann_ivf_refined_topk", r"BroadcastNestedLoopJoin"),
        # sub JOIN pc{final} ON c.s = x.s (codes + dt): broadcast hash
        ("pq_adc_topk", r"BroadcastHashJoin"),
    ):
        plan = _full_plan_string(REGISTRY[name].spark_fn(spark, SF))
        assert re.search(pattern, plan), (
            f"{name}: expected {pattern} for the staged centroid join"
        )
        # and no centroid join may have demoted to a sort-merge: the
        # only SMJ-legitimate relations here are lv/sub self-joins,
        # which these plans do not contain (verified at pin time)
        assert "SortMergeJoin" not in plan, (
            f"{name}: a staged-trainer join demoted to SortMergeJoin "
            "(broadcast pin lost?)"
        )
