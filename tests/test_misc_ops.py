"""Multimodal binary plumbing + streaming daemon wrapper + dockb contract."""

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(1, b"hello world " * 10), (2, b""), (3, bytes(range(256)))]
    return spark.createDataFrame(rows, "id long, media binary")


def test_featurize_bytes(media_df):
    from ner_spark.multimodal.binary import featurize

    got = {r.id: r for r in featurize(media_df).collect()}
    assert got[1].n_bytes == 120
    assert got[1].sha_prefix == hashlib.sha256(b"hello world " * 10).hexdigest()[:16]
    assert got[2].n_bytes == 0 and got[2].entropy == 0.0
    assert got[3].n_bytes == 256
    assert got[3].entropy == pytest.approx(4.0)  # uniform over 16 bins
    assert len(got[3].histogram) == 16 and all(h == 16 for h in got[3].histogram)


def test_sample_frames_deterministic(media_df):
    from ner_spark.multimodal.binary import sample_frames

    rows = [r for r in sample_frames(media_df, n_frames=4).collect() if r.id == 3]
    assert len(rows) == 4
    payload = bytes(range(256))
    for r in rows:
        assert bytes(r.frame_bytes) == payload[r.frame_no * 64:(r.frame_no + 1) * 64]


def test_decode_image_gated():
    from ner_spark.multimodal.binary import decode_image

    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; decode path live")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_stream_mentions_availablenow(spark, artifacts, pages_rows, tmp_path):
    from ner_spark.streaming.daemon import stream_mentions

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
         for p in pages_rows[:10]],
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.mode("overwrite").parquet(inp)
    out = str(tmp_path / "out")
    q = stream_mentions(spark, inp, artifacts, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) == {"url", "start", "end", "par", "kind", "text",
                                "sense", "iso", "confidence"}


def test_dockb_matches_sql_contract(spark):
    """compile_dockb must detect exactly the SURFACES tokens so the DuckDB
    oracle (token-equality SQL) stays exact."""
    from ner_spark.fixtures.dockb import SURFACES, compile_dockb
    from ner_spark.pipeline.ner import extract_mentions

    art = compile_dockb(spark)
    df = spark.createDataFrame(
        [("d1", "spark and vector met a stream in the window")],
        "url string, text string")
    got = extract_mentions(df, art).collect()
    assert {r.text for r in got} == {"spark", "vector", "stream", "window"}
    for r in got:
        assert r.sense == SURFACES.index(r.text) + 1


def test_hll_sketch_error_bound(spark, sf_dir):
    """approx_count_distinct at rsd=2% must land within 5% of the exact
    per-key distinct count on the driver testdata."""
    import __spark_entry__ as entrymod

    exact = {r.event_type: r.n_users
             for r in entrymod.q_distinct_users_exact(spark, sf_dir).collect()}
    approx = {r.event_type: r.n_users_approx
              for r in entrymod.q_distinct_users_hll(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.05 * n, 2), (k, n, approx[k])
