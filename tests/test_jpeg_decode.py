"""Pure baseline-JPEG luma decoder (`multimodal._jpeg_gray_rows`) and
the JPEG perceptual-dedup lane (`queries_round12.dedup_image_phash_jpeg`
fixtures): exact round-trip on the DC-only class, marker hygiene, and
PIL-independence of the phash path."""

from __future__ import annotations

from databox_adls_loader_spark.operators import multimodal as mm
from databox_adls_loader_spark.plans.queries_round12 import (
    _jpeg_assets, _jpeg_pixels, _mk_gray_jpeg)


def test_dc_only_roundtrip_is_exact():
    for i in (0, 3, 7, 30):
        px = _jpeg_pixels(i)
        out = mm._jpeg_gray_rows(_mk_gray_jpeg(px))
        assert out is not None
        w, h, gray = out
        assert (w, h) == (32, 32)
        assert gray == px


def test_roundtrip_exact_on_nonsquare_and_negative_dc():
    # values below 128 give negative DC coefficients; 16x40 exercises
    # a non-square block grid
    px = [[(bx * 53 + by * 29) % 256
           for bx in range(5) for _ in range(8)]
          for by in range(2) for _ in range(8)]
    out = mm._jpeg_gray_rows(_mk_gray_jpeg(px))
    assert out is not None and out[:2] == (40, 16)
    assert out[2] == px


def test_decoder_rejects_out_of_subset_streams():
    good = _mk_gray_jpeg(_jpeg_pixels(0))
    assert mm._jpeg_gray_rows(b"") is None
    assert mm._jpeg_gray_rows(b"\xff\xd8\xff\xd9") is None
    assert mm._jpeg_gray_rows(good[:40]) is None          # truncated
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2                                  # progressive
    assert mm._jpeg_gray_rows(bytes(prog)) is None
    # PNG bytes fall through cleanly
    assert mm._jpeg_gray_rows(b"\x89PNG\r\n\x1a\nrest") is None


def test_phash_words_hash_jpeg_without_pil(monkeypatch):
    monkeypatch.setattr(mm, "_PILImage", None)
    content = _mk_gray_jpeg(_jpeg_pixels(3))
    shifted = _mk_gray_jpeg(_jpeg_pixels(30))
    w3 = mm.image_phash_words(content, "ahash")
    w30 = mm.image_phash_words(shifted, "ahash")
    assert w3 is not None and w3 == w30       # brightness-invariant
    d3 = mm.image_phash_words(content, "dhash")
    assert d3 is not None and d3 == mm.image_phash_words(shifted,
                                                         "dhash")


def test_jpeg_lane_planted_pair_surfaces(spark, monkeypatch):
    monkeypatch.setattr(mm, "_PILImage", None)
    codes = mm.phash_codes(_jpeg_assets(spark), kind="ahash")
    assert codes.count() == 31                # every asset decoded
    pairs = {(r.a, r.b): r.hamming
             for r in mm.image_near_dup_pairs(codes).collect()}
    assert pairs[(3, 30)] == 0
