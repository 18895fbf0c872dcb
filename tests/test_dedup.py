

def test_positional_and_set_shingles_stay_in_sync(spark):
    """word_shingle_sets and positional_shingle_hashes re-implement
    the same tokenize/offset/concat/hash pipeline (set vs ordered
    stream). The oracles rely on the two staying bit-identical — this
    guard fails if a future tweak de-syncs them (r5 operator review)."""
    from etl_projects_spark.operators import dedup
    from etl_projects_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(25)
    sets = {
        r["id"]: set(r["sh_set"])
        for r in dedup.word_shingle_sets(docs).collect()
    }
    pos = {}
    for r in dedup.positional_shingle_hashes(docs).collect():
        pos.setdefault(r["id"], set()).add(r["h"])
    assert pos.keys() <= sets.keys()
    for doc_id, hashes in pos.items():
        assert hashes == sets[doc_id], doc_id
    # docs shorter than n yield an empty set AND zero positional rows
    for doc_id, s in sets.items():
        if not s:
            assert doc_id not in pos


def test_decontaminate_against_index_counts_hits(spark):
    """Cross-corpus probe: per eval doc, the count of its grams found
    in the index; zero-hit docs are absent (caller restores them)."""
    from etl_projects_spark.operators import dedup

    idx = spark.createDataFrame([("g1",), ("g2",), ("g3",)], "gram string")
    ev = spark.createDataFrame(
        [(1, "g1"), (1, "g2"), (1, "gX"), (2, "gY"), (3, "g3")],
        "doc_id long, gram string",
    )
    got = {r.doc_id: r.n_hit for r in
           dedup.decontaminate_against_index(ev, idx).collect()}
    assert got == {1: 2, 3: 1}  # doc 2 has no hits -> absent
