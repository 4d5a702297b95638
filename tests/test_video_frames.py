"""video_frame_stats: real AVI parsing through the mapInPandas operator
— sampled rows, exact pixel sums, and the zero-rows error contract for
undecodable payloads."""

from biocypher_metta_spark.operators.avi import avi_encode
from biocypher_metta_spark.operators.multimodal import video_frame_stats


def _frame(w, h, f):
    return bytes(((x * 7 + y * 13 + ch * 29 + f * 31) % 256)
                 for y in range(h) for x in range(w) for ch in range(3))


def test_video_frame_stats_rows_and_error_contract(spark):
    good = avi_encode([_frame(4, 3, f) for f in range(5)], 4, 3)
    media = spark.createDataFrame(
        [("v0", "video", bytearray(good)),
         ("bad", "video", bytearray(b"not an avi")),
         ("img", "image", bytearray(good))],       # filtered by kind
        "media_ref string, kind string, content binary")
    rows = {(r.media_ref, r.frame_index): (r.width, r.height, r.pix_sum)
            for r in video_frame_stats(media, stride=2).collect()}
    expected = {("v0", i): (4, 3, sum(_frame(4, 3, i))) for i in (0, 2, 4)}
    assert rows == expected
