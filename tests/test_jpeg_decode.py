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


# --------------------------------------------------------------------
# color (3-component YCbCr) streams through the luma-only decode path
# (round-13): Y reconstructed exactly, chroma parsed and discarded
# --------------------------------------------------------------------

def _color(px, **kw):
    from databox_adls_loader_spark.plans.queries_round13 import \
        _mk_color_jpeg

    return _mk_color_jpeg(px, **kw)


def test_color_dc_only_y_roundtrip_exact_all_samplings():
    for i in (0, 3, 30):
        px = _jpeg_pixels(i)
        for samp in ((2, 2), (1, 1), (2, 1), (1, 2)):
            out = mm._jpeg_gray_rows(_color(px, cb=77, cr=150,
                                            sampling=samp))
            assert out is not None, samp
            assert out[:2] == (32, 32)
            assert out[2] == px, (i, samp)


def test_color_chroma_never_leaks_into_luma(monkeypatch):
    # identical Y planes under wildly different chroma decode to the
    # same pixels — and to the grayscale encoding of the same plane
    monkeypatch.setattr(mm, "_PILImage", None)
    px = _jpeg_pixels(5)
    a = mm._jpeg_gray_rows(_color(px, cb=20, cr=230))
    b = mm._jpeg_gray_rows(_color(px, cb=200, cr=40))
    g = mm._jpeg_gray_rows(_mk_gray_jpeg(px))
    assert a is not None and a == b == g


def test_color_out_of_subset_rejected():
    good = bytearray(_color(_jpeg_pixels(0)))
    sof = good.find(b"\xff\xc0")
    # luma 3x1 sampling: outside the 2x2 envelope
    bad = bytearray(good)
    assert bad[sof + 11] == 0x22          # Y sampling byte
    bad[sof + 11] = 0x31
    assert mm._jpeg_gray_rows(bytes(bad)) is None
    # subsampled CHROMA (2x1): outside the 1x1-chroma subset
    bad = bytearray(good)
    assert bad[sof + 14] == 0x11          # Cb sampling byte
    bad[sof + 14] = 0x21
    assert mm._jpeg_gray_rows(bytes(bad)) is None
    # truncated mid-scan
    assert mm._jpeg_gray_rows(bytes(good[:len(good) // 2])) is None


def test_color_phash_planted_pair_without_pil(monkeypatch):
    monkeypatch.setattr(mm, "_PILImage", None)
    w3 = mm.image_phash_words(_color(_jpeg_pixels(3), cb=60, cr=60),
                              "ahash")
    w30 = mm.image_phash_words(_color(_jpeg_pixels(30), cb=180,
                                      cr=180), "ahash")
    assert w3 is not None and w3 == w30
