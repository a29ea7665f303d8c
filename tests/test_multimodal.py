"""Multimodal operators (operators/multimodal.py): binary exact dedup.

The decode plumbing itself is covered by q_multimodal_decode and the
differential suite; this file tests the byte-level dedup helper."""


def test_media_exact_duplicates(spark):
    from etl_sber_spark.operators.multimodal import media_exact_duplicates

    rows = [
        (1, bytearray(b"\x89PNG-payload-A")),
        (2, bytearray(b"\x89PNG-payload-B")),
        (3, bytearray(b"\x89PNG-payload-A")),  # byte-identical to 1
        (4, bytearray(b"\x89PNG-payload-A")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    groups = {
        r.payload_md5: r
        for r in media_exact_duplicates(df, with_ids=True).collect()
    }
    assert len(groups) == 2
    dup = next(r for r in groups.values() if r.n_copies > 1)
    assert dup.keep_id == 1 and dup.ids == [1, 3, 4]
    solo = next(r for r in groups.values() if r.n_copies == 1)
    assert solo.keep_id == 2


def test_media_dedup_null_payloads_excluded(spark):
    """Fetch failures (NULL payloads) must not be grouped as
    'duplicates' of each other."""
    from etl_sber_spark.operators.multimodal import media_exact_duplicates

    rows = [
        (1, bytearray(b"payload")),
        (2, None),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    groups = media_exact_duplicates(df).collect()
    assert len(groups) == 1 and groups[0].keep_id == 1
    assert "ids" not in groups[0].asDict()  # member list is opt-in
