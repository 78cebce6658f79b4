"""Concurrency + crash-safety of the persisted-index commit log
(plans/index_commit.py) — the round-7 verdict's task 4: no lost meta
updates under concurrent adds, no append/compact interleave corruption,
no crash window in compaction."""

import json
import os
import threading

from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")


def test_concurrent_text_adds_no_lost_stats(spark, tmp_path):
    """Three threads race add_to_text_index: every add must land
    (distinct commit versions) and the live n_docs/sum_dl must equal a
    single-writer build over the full corpus — the lost-update this
    protocol closes (the old read-modify-write meta.json lost one
    side's stats)."""
    from rag_content_spark.operators.search import bm25_scores
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        build_text_index,
        query_text_index,
    )
    from rag_content_spark.plans.text_index import add_to_text_index

    docs = _docs(spark)
    d = str(tmp_path / "ti")
    build_text_index(docs.filter(F.col("doc_id") % 4 == 0), d, n_buckets=8)
    errors = []

    def adder(residue):
        try:
            add_to_text_index(docs.filter(F.col("doc_id") % 4 == residue), d)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=adder, args=(i,)) for i in (1, 2, 3)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    snaps = ic.commits(d)
    assert [s["version"] for s in snaps] == [1, 2, 3, 4]
    assert [s["kind"] for s in snaps] == ["base", "add", "add", "add"]
    root, adds = ic.live_view(d)
    stats = ic.view_stats(root, adds)
    n = docs.count()
    from rag_content_spark.functions.text import tokens

    dl_sum = docs.select(
        F.sum(F.size(tokens("text"))).alias("s")
    ).collect()[0]["s"]
    assert stats["n_docs"] == n
    # BM25 over the concurrent view is bit-identical to the corpus scan
    terms = ["spark", "join", "merge"]
    got = {
        r["doc_id"]: r["bm25"]
        for r in query_text_index(spark, d, terms).collect()
    }
    ref = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, terms).collect()}
    assert got == ref and len(got) > 0
    assert stats["sum_dl"] == dl_sum


def test_add_racing_compact_stays_live(spark, tmp_path):
    """An add claimed AFTER compaction reads the live view (but before
    the compact commit) must survive: compact records base_version, and
    readers stack later adds on the compact root."""
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        add_to_text_index,
        build_text_index,
        query_text_index,
    )

    docs = _docs(spark)
    d = str(tmp_path / "ti")
    build_text_index(docs.filter(F.col("doc_id") % 3 == 0), d, n_buckets=8)
    add_to_text_index(docs.filter(F.col("doc_id") % 3 == 1), d)

    # simulate the race by claiming an add between compact's read and
    # its commit: monkeypatch claim to inject the racing add first
    import rag_content_spark.plans.text_index as ti

    real_claim = ic.claim
    injected = {"done": False}

    def racing_claim(index_dir, record):
        if record["kind"] == "compact" and not injected["done"]:
            injected["done"] = True
            add_to_text_index(docs.filter(F.col("doc_id") % 3 == 2), d)
        return real_claim(index_dir, record)

    ti.ic.claim = racing_claim
    try:
        ti.compact_text_index(spark, d)
    finally:
        ti.ic.claim = real_claim

    root, adds = ic.live_view(d)
    assert root["kind"] == "compact"
    # the racing add has version > base_version — still live
    assert len(adds) == 1
    stats = ic.view_stats(root, adds)
    assert stats["n_docs"] == docs.count()
    got = query_text_index(spark, d, ["spark", "join"]).count()
    from rag_content_spark.operators.search import bm25_scores

    assert got == bm25_scores(docs, ["spark", "join"]).count()


def test_compact_crash_leaves_live_view_intact(spark, tmp_path):
    """A crash at ANY point during compaction (before the commit claim)
    leaves the old view fully readable — there are no renames, so the
    round-7 two-rename recovery hole is structurally gone."""
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        add_to_text_index,
        build_text_index,
        query_text_index,
    )
    import rag_content_spark.plans.text_index as ti

    docs = _docs(spark)
    d = str(tmp_path / "ti")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), d, n_buckets=8)
    add_to_text_index(docs.filter(F.col("doc_id") % 2 == 1), d)
    terms = ["spark", "join", "merge"]
    before = sorted(
        (r["doc_id"], r["bm25"])
        for r in query_text_index(spark, d, terms).collect()
    )

    real_claim = ic.claim

    def crashing_claim(index_dir, record):
        if record["kind"] == "compact":
            raise RuntimeError("simulated crash before commit claim")
        return real_claim(index_dir, record)

    ti.ic.claim = crashing_claim
    try:
        import pytest

        with pytest.raises(RuntimeError, match="simulated crash"):
            ti.compact_text_index(spark, d)
    finally:
        ti.ic.claim = real_claim

    after = sorted(
        (r["doc_id"], r["bm25"])
        for r in query_text_index(spark, d, terms).collect()
    )
    assert after == before and len(after) > 0
    # the staged-but-unclaimed segment is debris, not corruption; a
    # real compact afterwards still works
    stats = ti.compact_text_index(spark, d)
    assert stats["n_files_after"] <= 8
    final = sorted(
        (r["doc_id"], r["bm25"])
        for r in query_text_index(spark, d, terms).collect()
    )
    assert final == before


def test_vacuum_reclaims_superseded_segments(spark, tmp_path):
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        add_to_text_index,
        build_text_index,
        compact_text_index,
        query_text_index,
        vacuum_text_index,
    )

    docs = _docs(spark)
    d = str(tmp_path / "ti")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), d, n_buckets=8)
    add_to_text_index(docs.filter(F.col("doc_id") % 2 == 1), d)
    compact_text_index(spark, d)
    terms = ["spark", "join"]
    before = sorted(
        (r["doc_id"], r["bm25"])
        for r in query_text_index(spark, d, terms).collect()
    )
    removed = vacuum_text_index(d)
    # base postings+lengths and add postings+lengths = 4 dirs reclaimed
    assert removed == 4
    assert [s["kind"] for s in ic.commits(d)] == ["compact"]
    after = sorted(
        (r["doc_id"], r["bm25"])
        for r in query_text_index(spark, d, terms).collect()
    )
    assert after == before
    # idempotent
    assert vacuum_text_index(d) == 0


def test_concurrent_ann_adds_no_lost_count(spark, tmp_path):
    """The ANN sibling: racing adds each claim a commit; n_vectors is
    the exact sum and every added vector is findable."""
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.ann_index import (
        add_to_ann_index,
        build_ann_index,
        load_ann_meta,
        query_ann_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    d = str(tmp_path / "ann")
    build_ann_index(emb.filter(F.col("vec_id") % 3 == 0), d, nlist=4, m=4, k=16)
    errors = []

    def adder(residue):
        try:
            add_to_ann_index(emb.filter(F.col("vec_id") % 3 == residue), d)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=adder, args=(i,)) for i in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    meta, _cb = load_ann_meta(d)
    assert meta["n_vectors"] == emb.count()
    assert [s["kind"] for s in ic.commits(d)] == ["base", "add", "add"]
    probe = emb.filter(F.col("vec_id") == 1).collect()[0]
    got = query_ann_index(
        spark, d, list(probe["embedding"]), topk=1, n_probe=4
    ).collect()
    assert got[0]["vec_id"] == 1


def test_ann_meta_records_column_roles(spark, tmp_path):
    """Round-7 ADVICE: a custom embedding column name must not break
    compaction's per-cell sort — id_col/embedding_col are recorded at
    build and used by add/compact/query."""
    from rag_content_spark.plans.ann_index import (
        add_to_ann_index,
        build_ann_index,
        compact_ann_index,
        query_ann_index,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            F.col("vec_id").alias("node_id"),
            F.col("embedding").alias("vector"),
        )
    )
    d = str(tmp_path / "ann")
    meta = build_ann_index(
        emb.filter(F.col("node_id") % 2 == 0),
        d,
        nlist=4,
        m=4,
        k=16,
        id_col="node_id",
        embedding_col="vector",
    )
    assert meta["id_col"] == "node_id" and meta["embedding_col"] == "vector"
    with open(os.path.join(d, "meta.json")) as f:
        raw = json.load(f)
    assert raw["id_col"] == "node_id" and raw["embedding_col"] == "vector"
    add_to_ann_index(emb.filter(F.col("node_id") % 2 == 1), d)
    qv = list(emb.filter(F.col("node_id") == 3).collect()[0]["vector"])
    before = [
        (r["node_id"], r["exact"])
        for r in query_ann_index(spark, d, qv, topk=5, n_probe=4).collect()
    ]
    stats = compact_ann_index(spark, d)
    assert stats["n_files_after"] < stats["n_files_before"]
    after = [
        (r["node_id"], r["exact"])
        for r in query_ann_index(spark, d, qv, topk=5, n_probe=4).collect()
    ]
    assert after == before and after[0][0] == 3


def test_text_index_delete_tombstones(spark, tmp_path):
    """delete_from_text_index: BM25 over the surviving view is
    bit-identical to a scan of the surviving corpus; stats deltas are
    exact; absent/duplicate ids are stats no-ops; compaction drops the
    tombstones physically and vacuum reclaims them."""
    from rag_content_spark.operators.search import bm25_scores
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        add_to_text_index,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
        query_text_index,
        vacuum_text_index,
    )

    docs = _docs(spark)
    d = str(tmp_path / "ti")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), d, n_buckets=8)
    add_to_text_index(docs.filter(F.col("doc_id") % 2 == 1), d)
    victims = [r["doc_id"] for r in docs.limit(5).collect()]
    meta = delete_from_text_index(spark, d, victims)
    survivors = docs.join(
        spark.createDataFrame([(v,) for v in victims], ["doc_id"]),
        "doc_id",
        "left_anti",
    )
    assert meta["n_docs"] == survivors.count()
    terms = ["spark", "join", "merge"]
    got = {
        r["doc_id"]: r["bm25"]
        for r in query_text_index(spark, d, terms).collect()
    }
    ref = {
        r["doc_id"]: r["bm25"] for r in bm25_scores(survivors, terms).collect()
    }
    assert got == ref and not any(v in got for v in victims)
    # absent id + re-delete: stats unchanged
    meta2 = delete_from_text_index(spark, d, [victims[0], 999_999_999])
    assert meta2["n_docs"] == meta["n_docs"]
    assert meta2["sum_dl"] == meta["sum_dl"]
    # compaction applies tombstones physically, results identical
    stats = compact_text_index(spark, d)
    root, adds = ic.live_view(d)
    assert root["kind"] == "compact" and adds == []
    after = {
        r["doc_id"]: r["bm25"]
        for r in query_text_index(spark, d, terms).collect()
    }
    assert after == ref
    # base (postings+lengths) + add (postings+lengths) + 2 tombstones
    assert vacuum_text_index(d) == 6
    assert {
        r["doc_id"] for r in query_text_index(spark, d, terms).collect()
    } == set(ref)


def test_positional_index_delete(spark, tmp_path):
    from rag_content_spark.operators.search import phrase_search
    from rag_content_spark.plans.text_index import (
        build_text_index,
        delete_from_text_index,
        phrase_query_text_index,
    )

    docs = _docs(spark)
    d = str(tmp_path / "pi")
    build_text_index(docs, d, n_buckets=8, positions=True)
    hits = phrase_query_text_index(spark, d, "the spark").collect()
    assert hits
    victim = hits[0]["doc_id"]
    delete_from_text_index(spark, d, [victim])
    after = {
        r["doc_id"]
        for r in phrase_query_text_index(spark, d, "the spark").collect()
    }
    assert victim not in after
    ref = {
        r["doc_id"]
        for r in phrase_search(
            docs.filter(F.col("doc_id") != victim), "the spark"
        ).collect()
    }
    assert after == ref


def test_ann_index_delete(spark, tmp_path):
    from rag_content_spark.plans.ann_index import (
        build_ann_index,
        compact_ann_index,
        delete_from_ann_index,
        query_ann_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    d = str(tmp_path / "ann")
    meta0 = build_ann_index(emb, d, nlist=4, m=4, k=16)
    probe = emb.orderBy("vec_id").limit(1).collect()[0]
    top = query_ann_index(
        spark, d, list(probe["embedding"]), topk=1, n_probe=4
    ).collect()
    assert top[0]["vec_id"] == probe["vec_id"]
    meta1 = delete_from_ann_index(spark, d, [int(probe["vec_id"])])
    assert meta1["n_vectors"] == meta0["n_vectors"] - 1
    after = query_ann_index(
        spark, d, list(probe["embedding"]), topk=3, n_probe=4
    ).collect()
    assert all(r["vec_id"] != probe["vec_id"] for r in after)
    stats = compact_ann_index(spark, d)
    assert stats["n_rows"] == meta1["n_vectors"]
    post = query_ann_index(
        spark, d, list(probe["embedding"]), topk=3, n_probe=4
    ).collect()
    assert [r["vec_id"] for r in post] == [r["vec_id"] for r in after]


def _make_legacy_index(spark, docs, d):
    """Materialize a pre-log (round-7 layout) index: bare postings/ +
    lengths/ dirs and stats inside meta.json, no commit log."""
    import shutil

    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import build_text_index

    meta = build_text_index(docs, d, n_buckets=8)
    root, adds = ic.live_view(d)
    assert adds == []
    os.rename(
        os.path.join(d, root["dirs"]["postings"]), os.path.join(d, "postings")
    )
    os.rename(
        os.path.join(d, root["dirs"]["lengths"]), os.path.join(d, "lengths")
    )
    shutil.rmtree(os.path.join(d, "commits"))
    legacy_meta = {
        "format": "rag-spark-text/1",
        "n_buckets": meta["n_buckets"],
        "id_col": meta["id_col"],
        "positions": meta["positions"],
        "n_docs": root["stats"]["n_docs"],
        "sum_dl": root["stats"]["sum_dl"],
    }
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(legacy_meta, f)


def test_legacy_index_reads_and_upgrades(spark, tmp_path):
    """A pre-log index queries transparently, and racing first writers
    upgrade it exactly once (the ensure_base version-1 pin: a loser
    retrying to the tip must never claim a base ABOVE another writer's
    add, which would mask it)."""
    from rag_content_spark.operators.search import bm25_scores
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        add_to_text_index,
        query_text_index,
    )

    docs = _docs(spark)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    d = str(tmp_path / "legacy")
    _make_legacy_index(spark, half, d)
    terms = ["spark", "join", "merge"]
    # reads work with no commit log at all
    got = {
        r["doc_id"]: r["bm25"]
        for r in query_text_index(spark, d, terms).collect()
    }
    ref = {r["doc_id"]: r["bm25"] for r in bm25_scores(half, terms).collect()}
    assert got == ref and len(got) > 0
    # two racing first adds: one upgrade base at v1, both adds live
    errors = []

    def adder(residue):
        try:
            add_to_text_index(
                docs.filter(
                    (F.col("doc_id") % 2 == 1)
                    & (F.col("doc_id") % 4 == residue)
                ),
                d,
            )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=adder, args=(i,)) for i in (1, 3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    snaps = ic.commits(d)
    assert [s["kind"] for s in snaps] == ["base", "add", "add"]
    assert snaps[0]["dirs"] == {"postings": "postings", "lengths": "lengths"}
    root, adds = ic.live_view(d)
    assert ic.view_stats(root, adds)["n_docs"] == docs.count()
    got2 = {
        r["doc_id"]: r["bm25"]
        for r in query_text_index(spark, d, terms).collect()
    }
    ref2 = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, terms).collect()}
    assert got2 == ref2


def test_delete_racing_add_keeps_rows_exact(spark, tmp_path):
    """Round-8 verdict task 6 (delete-vs-add): a delete racing an add of
    DISJOINT docs must lose nothing — every commit lands, survivors =
    (base - deleted) + added, the deleted ids never resurface, and the
    stats are exact (the write-skew caveat only applies to OVERLAPPING
    id sets, covered by test_overlapping_deletes_selfheal_at_compact)."""
    from rag_content_spark.operators.search import bm25_scores
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        add_to_text_index,
        build_text_index,
        delete_from_text_index,
        query_text_index,
    )

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    extra = docs.filter(F.col("doc_id") % 2 == 1)
    d = str(tmp_path / "ti")
    build_text_index(base, d, n_buckets=8)
    victims = [r["doc_id"] for r in base.limit(4).collect()]
    errors = []

    def do_add():
        try:
            add_to_text_index(extra, d)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def do_delete():
        try:
            delete_from_text_index(spark, d, victims)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=do_add),
        threading.Thread(target=do_delete),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    snaps = ic.commits(d)
    assert [s["version"] for s in snaps] == [1, 2, 3]
    assert sorted(s["kind"] for s in snaps[1:]) == ["add", "delete"]
    survivors = docs.join(
        spark.createDataFrame([(v,) for v in victims], ["doc_id"]),
        "doc_id",
        "left_anti",
    )
    terms = ["spark", "join", "merge"]
    got = {
        r["doc_id"]: r["bm25"]
        for r in query_text_index(spark, d, terms).collect()
    }
    ref = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(survivors, terms).collect()
    }
    # disjoint-sets race: rows AND stats must both be exact, so BM25
    # (which folds n_docs/avgdl into every score) is bit-identical
    assert got == ref and not any(v in got for v in victims)
    root, adds = ic.live_view(d)
    assert ic.view_stats(root, adds)["n_docs"] == survivors.count()


def test_delete_racing_compact_no_resurrection(spark, tmp_path):
    """Round-8 verdict task 6 (delete-vs-compact): a delete claimed
    while a compaction runs lands ABOVE base_version, so its tombstone
    stays live on top of the compact root — the deleted rows must NOT
    resurrect through the racing compact, and the next compaction
    applies the tombstone physically."""
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        add_to_text_index,
        build_text_index,
        delete_from_text_index,
        query_text_index,
    )
    import rag_content_spark.plans.text_index as ti

    docs = _docs(spark)
    d = str(tmp_path / "ti")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), d, n_buckets=8)
    add_to_text_index(docs.filter(F.col("doc_id") % 2 == 1), d)
    victims = [r["doc_id"] for r in docs.limit(5).collect()]

    real_claim = ic.claim
    injected = {"done": False}

    def racing_claim(index_dir, record):
        # inject the delete between compact's read and its commit claim
        if record["kind"] == "compact" and not injected["done"]:
            injected["done"] = True
            delete_from_text_index(spark, d, victims)
        return real_claim(index_dir, record)

    ti.ic.claim = racing_claim
    try:
        ti.compact_text_index(spark, d)
    finally:
        ti.ic.claim = real_claim

    root, adds = ic.live_view(d)
    assert root["kind"] == "compact"
    assert [a["kind"] for a in adds] == ["delete"]  # still live
    terms = ["spark", "join", "merge"]
    got = {
        r["doc_id"] for r in query_text_index(spark, d, terms).collect()
    }
    assert not (got & set(victims))  # no resurrection
    survivors = docs.join(
        spark.createDataFrame([(v,) for v in victims], ["doc_id"]),
        "doc_id",
        "left_anti",
    )
    stats = ic.view_stats(root, adds)
    assert stats["n_docs"] == survivors.count()
    # second compact absorbs the tombstone physically and recounts
    ti.compact_text_index(spark, d)
    root2, adds2 = ic.live_view(d)
    assert adds2 == []
    assert root2["stats"]["n_docs"] == survivors.count()
    got2 = {
        r["doc_id"] for r in query_text_index(spark, d, terms).collect()
    }
    assert got2 == got


def test_overlapping_deletes_selfheal_at_compact(spark, tmp_path):
    """Two concurrent deletes of OVERLAPPING ids both compute their
    negative stats delta against the same pre-state — the documented
    write-skew: rows stay exact (anti-join is idempotent) but
    n_docs/sum_dl double-decrement. Compaction recomputes stats from the
    materialized survivors, so the drift self-heals (round-8 ADVICE on
    delete_from_text_index)."""
    from rag_content_spark.functions.text import tokens
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.text_index import (
        build_text_index,
        delete_from_text_index,
        query_text_index,
    )
    import rag_content_spark.plans.text_index as ti

    docs = _docs(spark)
    d = str(tmp_path / "ti")
    build_text_index(docs, d, n_buckets=8)
    ids = [r["doc_id"] for r in docs.limit(6).collect()]
    set_a, set_b = ids[:4], ids[2:]  # overlap = ids[2:4]

    # deterministic interleave: when delete(A) is about to claim (its
    # delta already computed against the full view), inject delete(B)
    # whole — B's delta is ALSO computed against the full view
    real_claim = ic.claim
    injected = {"done": False}

    def racing_claim(index_dir, record):
        if record["kind"] == "delete" and not injected["done"]:
            injected["done"] = True
            delete_from_text_index(spark, d, set_b)
        return real_claim(index_dir, record)

    ti.ic.claim = racing_claim
    try:
        delete_from_text_index(spark, d, set_a)
    finally:
        ti.ic.claim = real_claim

    survivors = docs.join(
        spark.createDataFrame([(v,) for v in set(ids)], ["doc_id"]),
        "doc_id",
        "left_anti",
    )
    n_true = survivors.count()
    dl_true = survivors.select(
        F.sum(F.size(tokens("text"))).alias("s")
    ).collect()[0]["s"]
    root, adds = ic.live_view(d)
    skewed = ic.view_stats(root, adds)
    # rows exact despite the race
    terms = ["spark", "join", "merge"]
    got = {
        r["doc_id"] for r in query_text_index(spark, d, terms).collect()
    }
    assert not (got & set(ids))
    # the overlap double-decremented: drift is real and equals the
    # overlapping docs' contribution
    assert skewed["n_docs"] == n_true - 2
    assert skewed["sum_dl"] < dl_true
    # compaction recounts the materialized survivors: drift healed
    ti.compact_text_index(spark, d)
    root2, adds2 = ic.live_view(d)
    assert adds2 == []
    assert root2["stats"]["n_docs"] == n_true
    assert root2["stats"]["sum_dl"] == dl_true


def test_ann_delete_racing_compact(spark, tmp_path):
    """ANN sibling of the delete-vs-compact race: the racing tombstone
    stays live over the compact root (no resurrected vectors) and the
    next compaction's recount makes the stats exact."""
    from rag_content_spark.plans import index_commit as ic
    from rag_content_spark.plans.ann_index import (
        build_ann_index,
        delete_from_ann_index,
        query_ann_index,
    )
    import rag_content_spark.plans.ann_index as ai

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    d = str(tmp_path / "ann")
    meta0 = build_ann_index(emb, d, nlist=4, m=4, k=16)
    probe = emb.orderBy("vec_id").limit(1).collect()[0]

    real_claim = ic.claim
    injected = {"done": False}

    def racing_claim(index_dir, record):
        if record["kind"] == "compact" and not injected["done"]:
            injected["done"] = True
            delete_from_ann_index(spark, d, [int(probe["vec_id"])])
        return real_claim(index_dir, record)

    ai.ic.claim = racing_claim
    try:
        ai.compact_ann_index(spark, d)
    finally:
        ai.ic.claim = real_claim

    root, adds = ic.live_view(d)
    assert root["kind"] == "compact"
    assert [a["kind"] for a in adds] == ["delete"]
    res = query_ann_index(
        spark, d, list(probe["embedding"]), topk=3, n_probe=4
    ).collect()
    assert all(r["vec_id"] != probe["vec_id"] for r in res)
    stats = ic.view_stats(root, adds)
    assert stats["n_vectors"] == meta0["n_vectors"] - 1
    ai.compact_ann_index(spark, d)
    root2, adds2 = ic.live_view(d)
    assert adds2 == []
    assert root2["stats"]["n_vectors"] == meta0["n_vectors"] - 1
