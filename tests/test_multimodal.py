

def test_png_roundtrip_exact():
    """Pure-stdlib PNG encode → decode returns the exact pixel buffer
    (RGB and RGBA)."""
    from json_ld_spark.operators import multimodal as mm

    for ch in (3, 4):
        w, h = 13, 7
        px = bytes((x * 31 + c * 7 + 5) % 256 for x in range(w * h) for c in range(ch))
        data = mm.png_encode(w, h, px, channels=ch)
        w2, h2, ch2, out = mm.png_decode(data)
        assert (w2, h2, ch2) == (w, h, ch)
        assert bytes(out) == px


def test_png_decode_all_filters():
    """The decoder must invert every PNG scanline filter (spec §9):
    build filtered raw streams directly and check against a reference
    unfiltered image."""
    import struct
    import zlib

    from json_ld_spark.operators import multimodal as mm

    w, h, ch = 5, 4, 3
    px = bytes((11 * i + 3) % 256 for i in range(w * h * ch))
    stride = w * ch

    def filt(ftype, line, prev):
        out = bytearray()
        for i in range(stride):
            x = line[i]
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                out.append(x)
            elif ftype == 1:
                out.append((x - a) & 0xFF)
            elif ftype == 2:
                out.append((x - b) & 0xFF)
            elif ftype == 3:
                out.append((x - ((a + b) >> 1)) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((x - pred) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        ftype = y % 5 if h >= 5 else (y + 1) % 5  # exercise filters 1-4
        raw += bytes([ftype]) + filt(ftype, line, prev)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mm._png_chunk(b"IEND", b"")
    )
    w2, h2, ch2, out = mm.png_decode(data)
    assert bytes(out) == px


def test_png_image_features_match_formula(spark):
    """image_features decodes the REAL PNG payloads; results must equal
    the closed-form pixel statistics."""
    from json_ld_spark.operators import multimodal as mm

    media = mm.synthesize_png_media(spark, n=6)
    rows = {r["media_id"]: r for r in mm.image_features(media).collect()}
    for i in range(6):
        w, h = 8 + i % 9, 8 + (3 * i) % 9
        sum_r = sum((7 * x + 13 * y + i) % 256 for x in range(w) for y in range(h))
        r = rows[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["sum_r"] == sum_r


def test_decode_media_png_dispatch():
    from json_ld_spark.operators import multimodal as mm

    data = mm.png_encode(4, 3, bytes(range(36)))
    dec = mm.decode_media(data, "image")
    assert dec["width"] == 4 and dec["height"] == 3 and dec["channels"] == 3


# ---------------------------------------------------------------------------
# AVI codec (real, stdlib-only)
# ---------------------------------------------------------------------------


def test_avi_roundtrip_with_stride_padding():
    from json_ld_spark.operators.multimodal import avi_decode, avi_encode

    w, h = 9, 5  # 9*3=27 -> DIB stride pads to 28
    frames = []
    for t in range(3):
        buf = bytearray()
        for y in range(h):
            for x in range(w):
                buf += bytes(((7 * x + t) % 256, (5 * y + t) % 256, (x + y) % 256))
        frames.append(bytes(buf))
    data = avi_encode(frames, w, h)
    w2, h2, nf, out = avi_decode(data)
    assert (w2, h2, nf) == (w, h, 3)
    assert [bytes(f) for f in out] == frames


def test_avi_riff_structure():
    from json_ld_spark.operators.multimodal import avi_encode

    data = avi_encode([bytes(4 * 3 * 3)], 4, 3)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert b"avih" in data and b"strh" in data and b"strf" in data
    assert b"movi" in data and b"00db" in data
    # RIFF size field covers the rest of the file exactly
    import struct
    (riff_len,) = struct.unpack_from("<I", data, 4)
    assert riff_len == len(data) - 8


def test_decode_media_video_branch():
    from json_ld_spark.operators.multimodal import avi_encode, decode_media

    frame = bytes(range(0, 36))  # 4x3 RGB
    dec = decode_media(avi_encode([frame], 4, 3), "video")
    assert (dec["width"], dec["height"], dec["n_frames"]) == (4, 3, 1)
    assert bytes(dec["frames"][0]) == frame


def test_decode_media_compressed_video_rejected():
    import pytest as _pytest

    from json_ld_spark.operators.multimodal import decode_media

    with _pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_media(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32, "video")


def test_video_features_match_python_reference(spark):
    import numpy as np

    from json_ld_spark.operators import multimodal as mm

    media = mm.synthesize_avi_media(spark, n=6)
    got = {r["media_id"]: r for r in mm.video_features(media).collect()}
    for i in range(6):
        w, h, nf = 8 + i % 5, 6 + i % 4, 2 + i % 3
        frames = []
        for t in range(nf):
            a = np.zeros((h, w, 3), dtype=np.int64)
            for y in range(h):
                for x in range(w):
                    a[y, x] = (
                        (7 * x + 13 * y + 17 * t + i) % 256,
                        (3 * x + 5 * y + 23 * t + 2 * i) % 256,
                        (11 * x + y + 29 * t + 3 * i) % 256,
                    )
            frames.append(a)
        allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
        motion = sum(
            int(np.abs(frames[t][:, :, 0].astype(int) - frames[t - 1][:, :, 0]).sum())
            for t in range(1, nf)
        )
        r = got[i]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(
            int(allpx[:, c].sum()) for c in range(3)
        )
        assert r["motion"] == motion


def test_sample_video_frames_roundtrip_pngs(spark):
    from json_ld_spark.operators import multimodal as mm

    media = mm.synthesize_avi_media(spark, n=4)
    rows = mm.sample_video_frames(media, every_n=2).collect()
    # every 2nd frame of each video: nf = 2+i%3 -> sampled = ceil(nf/2)
    expect = sum(-(-(2 + i % 3) // 2) for i in range(4))
    assert len(rows) == expect
    for r in rows:
        w, h, ch, px = mm.png_decode(bytes(r["png"]))
        assert (w, h, ch) == (r["width"], r["height"], 3)
        assert r["frame_idx"] % 2 == 0


def test_sample_video_frames_rejects_bad_step(spark):
    import pytest as _pytest

    from json_ld_spark.operators import multimodal as mm

    with _pytest.raises(ValueError):
        mm.sample_video_frames(mm.synthesize_avi_media(spark, n=1), every_n=0)


def test_resize_images_roundtrip_and_sampling(spark):
    from json_ld_spark.operators.multimodal import (
        png_decode, resize_images, synthesize_png_media,
    )

    media = synthesize_png_media(spark, n=6)
    rows = {r.media_id: r for r in resize_images(media, 5, 4).collect()}
    assert len(rows) == 6
    for i, r in rows.items():
        w, h = 8 + i % 9, 8 + (3 * i) % 9
        assert (r.width, r.height, r.out_w, r.out_h) == (w, h, 5, 4)
        # decode the re-encoded PNG and replay the NN sampling math
        rw, rh, ch, px = png_decode(bytes(r.resized_png))
        assert (rw, rh, ch) == (5, 4, 3)
        xs = [(x * w) // 5 for x in range(5)]
        ys = [(y * h) // 4 for y in range(4)]
        want = []
        for y in ys:
            for x in xs:
                want += [(7 * x + 13 * y + i) % 256,
                         (3 * x + 5 * y + 2 * i) % 256,
                         (11 * x + y + 3 * i) % 256]
        assert list(px) == want
        assert r.sum_r == sum(want[0::3])
        assert r.sum_g == sum(want[1::3])
        assert r.sum_b == sum(want[2::3])


def test_decimate_audio_roundtrip(spark):
    import math

    from json_ld_spark.operators.multimodal import (
        decimate_audio, decode_media, synthesize_wav_media,
    )

    media = synthesize_wav_media(spark, n=4)
    rows = {r.media_id: r for r in decimate_audio(media, factor=4).collect()}
    assert len(rows) == 4
    for i, r in rows.items():
        freq = 220.0 + 55.0 * (i % 16)
        want = [int(6000 * math.sin(2 * math.pi * freq * k / 8000.0))
                for k in range(0, 1600, 4)]
        assert (r.n_in, r.n_out, r.out_rate) == (1600, 400, 2000)
        assert r.sum_abs_out == sum(abs(v) for v in want)
        assert r.max_abs_out == max(abs(v) for v in want)
        dec = decode_media(bytes(r.resampled_wav), "audio")
        assert dec["sample_rate"] == 2000
        assert list(dec["samples"]) == want


def _dhash_python(i, variant=False, bump=16, grid_w=8, grid_h=8):
    """Pure-Python replay of the textured corpus + dHash pipeline."""
    w, h = 16 + i % 9, 16 + (3 * i) % 9
    a, b, c, d = 3 + (i * 7) % 11, 1 + (i * 5) % 13, 1 + i % 7, i * 17

    def gray(x, y):
        r = (a * x * x + b * y + d + (bump if variant and x == 0 else 0)) % 256
        g = (b * x + c * y * y + 2 * d) % 256
        bb = (c * x + a * y + 3 * d) % 256
        return (r + 2 * g + bb) // 4

    blocks = []
    for gy in range(grid_h):
        sy = (gy * h) // grid_h
        val = 0
        for gx in range(grid_w):
            s0, s1 = (gx * w) // (grid_w + 1), ((gx + 1) * w) // (grid_w + 1)
            if gray(s1, sy) > gray(s0, sy):
                val |= 1 << gx
        blocks.append(val)
    return blocks


def test_dhash_blocks_match_python_replay(spark):
    from json_ld_spark.operators import multimodal as mm

    media = mm.synthesize_png_media_textured(spark, n=12)
    got = {r["media_id"]: list(r["blocks"]) for r in mm.dhash_images(media).collect()}
    for i in range(12):
        assert got[i] == _dhash_python(i), i


def test_dhash_near_duplicates_recall_and_precision(spark):
    """Variants within hamming<=6 of their base are all found
    (pigeonhole recall 1.0); the pair list equals the brute-force
    all-pairs answer computed in Python."""
    import itertools

    from json_ld_spark.operators import multimodal as mm

    media = mm.synthesize_png_media_textured(spark, n=16).unionByName(
        mm.synthesize_png_media_textured(spark, n=8, variant=True)
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.dhash_near_duplicates(
            mm.dhash_images(media), max_hamming=6
        ).collect()
    }
    hashes = {i: _dhash_python(i) for i in range(16)}
    hashes.update({100 + i: _dhash_python(i, variant=True) for i in range(8)})

    def ham(u, v):
        return sum(bin(x ^ y).count("1") for x, y in zip(u, v))

    want = {
        (p, q): ham(hashes[p], hashes[q])
        for p, q in itertools.combinations(sorted(hashes), 2)
        if ham(hashes[p], hashes[q]) <= 6
    }
    assert got == want
    assert len(got) > 0  # at least some variants land in-threshold


def test_dhash_pigeonhole_guard(spark):
    import pytest

    from json_ld_spark.operators import multimodal as mm

    media = mm.synthesize_png_media_textured(spark, n=2)
    with pytest.raises(ValueError):
        mm.dhash_near_duplicates(mm.dhash_images(media), max_hamming=8, n_blocks=8)
