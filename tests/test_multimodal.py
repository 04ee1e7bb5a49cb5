"""Multimodal column plumbing: binary payloads + mapInPandas kernels.
The decode step is a deterministic fake (codecs absent from the container);
everything Spark-side — schemas, Arrow binary transfer, fan-out shape —
is exercised for real."""
import hashlib

import pytest
from pyspark.sql import functions as F

from process_nwb_spark.llm.multimodal import (_N_IMG_FEATURES, _N_MEL,
                                              _fake_decode_image,
                                              attach_payloads, decode_real,
                                              extract_audio_features,
                                              extract_image_features,
                                              sample_frames)
from process_nwb_spark.relational.core import T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mm(spark):
    df = attach_payloads(T(spark, SF, "documents")).cache()
    df.count()
    yield df
    df.unpersist()


def test_payload_schema_and_split(spark, mm):
    assert dict(mm.dtypes)["payload"] == "binary"
    n_docs = T(spark, SF, "documents").count()
    per_mod = dict(mm.groupBy("modality").count().collect())
    assert sum(per_mod.values()) == n_docs
    assert set(per_mod) == {"image", "audio", "video"}


def test_image_features(spark, mm):
    feats = extract_image_features(mm)
    rows = feats.collect()
    assert len(rows) == mm.filter(F.col("modality") == "image").count()
    r = rows[0]
    assert len(r.features) == _N_IMG_FEATURES
    # deterministic in payload content: recompute driver-side
    payload = (mm.filter(F.col("doc_id") == r.doc_id)
               .select("payload").first()[0])
    assert r.content_hash == hashlib.md5(bytes(payload)).hexdigest()
    expect = _fake_decode_image(bytes(payload))
    assert [round(float(x), 5) for x in r.features] == \
           [round(float(x), 5) for x in expect]


def test_audio_features(spark, mm):
    rows = extract_audio_features(mm).collect()
    assert len(rows) == mm.filter(F.col("modality") == "audio").count()
    assert all(len(r.mel_mean) == _N_MEL for r in rows[:5])
    assert all(r.sample_rate == 16000 for r in rows[:5])


def test_frame_sampling_fanout(spark, mm):
    frames = sample_frames(mm, every_n=10)
    pdf = frames.toPandas()
    vids = mm.filter(F.col("modality") == "video").select(
        "doc_id", "meta.n_frames").toPandas()
    # fan-out: one row per sampled frame, ceil(n_frames/10) per video
    expect = int((-(-vids["n_frames"] // 10)).sum())
    assert len(pdf) == expect
    assert (pdf.groupby("doc_id").frame_idx.is_monotonic_increasing).all()


def test_real_decoder_is_marked_unavailable():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00")


def test_curation_pipeline(spark):
    """End-to-end curation program: gates -> dedup -> embedding -> bucket,
    deterministic and fully JVM-side (no UDFs in the plan)."""
    from process_nwb_spark.llm.curation import _EMB_DIM, curate
    from process_nwb_spark.plans.inspect import formatted_plan

    docs = T(spark, SF, "documents")
    out = curate(docs, langs=("en", "de", "fr", "es"))
    pdf = out.toPandas()
    assert 0 < len(pdf) <= docs.count()
    assert pdf.fp.is_unique is False or len(pdf) == pdf.fp.nunique()
    r = pdf.iloc[0]
    assert len(r.embedding) == _EMB_DIM
    assert all(-1.0 <= float(x) < 1.0 for x in r.embedding)
    assert 0 <= int(r.bucket) < 16
    # deterministic across runs
    pdf2 = curate(docs, langs=("en", "de", "fr", "es")).toPandas()
    assert (pdf.sort_values("doc_id").bucket.to_numpy()
            == pdf2.sort_values("doc_id").bucket.to_numpy()).all()
    # stays JVM-side: no python evaluation nodes
    plan = formatted_plan(out, "simple")
    assert "EvalPython" not in plan


def test_curated_bucket_index_prunes(spark, tmp_path):
    """The curation output written partitionBy(bucket) IS the ANN index:
    a probe filtered to one bucket reads one partition (PartitionFilters),
    not the corpus."""
    from process_nwb_spark.llm.curation import curate
    from process_nwb_spark.plans.inspect import formatted_plan

    out = str(tmp_path / "ann_index")
    curated = curate(T(spark, SF, "documents"), langs=("en", "de", "fr", "es"))
    curated.write.partitionBy("bucket").parquet(out)
    idx = spark.read.parquet(out)
    probe = idx.filter(F.col("bucket") == 3)
    plan = formatted_plan(probe)
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "bucket" in frag
    assert probe.count() == curated.filter(F.col("bucket") == 3).count()


def test_assemble_pipeline(spark):
    """curate -> split -> pack composition: only train docs, packs replay
    sequentially per source, and every kept doc came through curation."""
    from process_nwb_spark.llm.curation import assemble, curate
    from process_nwb_spark.relational.core import T

    docs = T(spark, "/root/testdata/sf0.01", "documents")
    out = assemble(docs).toPandas().sort_values(["source", "doc_id"])
    assert len(out) > 0
    assert (out.split == "train").all()
    cur_ids = set(curate(docs).toPandas().doc_id)
    assert set(out.doc_id) <= cur_ids
    for _, g in out.groupby("source"):
        cum = 0
        for _, row in g.iterrows():
            assert row.pack_id == cum // 2048
            cum += row.n_tokens
