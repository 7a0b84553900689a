import numpy as np
import pyarrow as pa

from nifi_processors_ray.stages.textstats import (
    FingerprintStage,
    LangIdStage,
    QualityScoreStage,
    count_tokens,
)


def test_count_tokens():
    t = pa.table({"text": ["a b  c", "", "  x ", None, "one"]})
    out = count_tokens(t)
    assert out["n_tokens"].to_pylist() == [3, 0, 1, None, 1]


def test_quality_score_ranges_and_features():
    t = pa.table({"text": [
        "The cat sat on the mat and it is a fine day for the cat.",
        "1234 5678 !!!! ????",
        "",
    ]})
    out = QualityScoreStage()(t)
    scores = out["quality_score"].to_pylist()
    assert 0.0 <= min(scores) and max(scores) <= 1.0
    assert scores[0] > scores[1]  # prose beats digit/punct soup
    assert out["n_tokens"].to_pylist() == [15, 4, 0]
    assert out["alpha_ratio"].to_pylist()[1] == 0.0


def test_lang_id_heuristic():
    t = pa.table({"text": [
        "the cat and the dog went to the market for a day",
        "der Hund und die Katze sind nicht mit mir",
        "le chat et les chiens sont pour la maison",
        "el perro y la casa de los gatos es una historia",
        "zzz qqq www",
    ]})
    out = LangIdStage()(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "es", "other"]


def test_fingerprints_deterministic_and_similarity_aware():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")  # near-dup
    c = "completely different content about ray data engines and arrow"
    t = pa.table({"text": [a, a, b, c, "", None]})
    out = FingerprintStage()(t)
    fp = out["fingerprint64"].to_pylist()
    sh = out["simhash64"].to_pylist()
    assert fp[0] == fp[1] and sh[0] == sh[1]  # identical content
    assert fp[0] != fp[2]

    def ham(x, y):
        return bin(x ^ y).count("1")

    assert ham(sh[0], sh[2]) < ham(sh[0], sh[3])  # near-dup closer than random
    assert sh[4] == 0


def test_fingerprint_partitioning_invariance():
    rows = [f"doc number {i} with some shared tokens" for i in range(10)]
    whole = FingerprintStage()(pa.table({"text": rows}))
    parts = pa.concat_tables([
        FingerprintStage()(pa.table({"text": rows[:3]})),
        FingerprintStage()(pa.table({"text": rows[3:]})),
    ])
    assert whole["simhash64"].to_pylist() == parts["simhash64"].to_pylist()
    assert whole["fingerprint64"].to_pylist() == parts["fingerprint64"].to_pylist()


def test_normalize_text_and_pii_scrub():
    import pyarrow as pa

    from nifi_processors_ray.stages.textclean import normalize_text, scrub_pii

    t = pa.table({"text": [
        "  hello\t\tworld \x00\x1f!",
        "cafe\u0301 mail me at a.b+c@ex-1.org or +1 (555) 123-4567",
        "server 10.0.0.1 up",
    ]})
    out = normalize_text(t)
    got = out["text_norm"].to_pylist()
    assert got[0] == "hello world !"
    assert got[1].startswith("caf\u00e9 ")  # NFC composes e + combining acute
    out2 = scrub_pii(t)
    s = out2["text_scrubbed"].to_pylist()
    assert "<EMAIL>" in s[1] and "a.b+c@" not in s[1]
    assert "<PHONE>" in s[1]
    assert s[2] == "server <IP> up"


def test_ppm_roundtrip_resize_and_features():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nifi_processors_ray.stages.multimodal import (
        ImageFeatureStage,
        decode_ppm,
        encode_ppm,
        resize_nearest,
        synthesize_ppm_media,
    )

    rng = np.random.Generator(np.random.PCG64(4))
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comment-tolerant header
    with_comment = b"P6\n# a comment\n7 10\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)
    small = resize_nearest(img, 5, 4)
    assert small.shape == (5, 4, 3)
    assert np.array_equal(small[0, 0], img[0, 0])

    media = synthesize_ppm_media(8, width=16, height=12)
    ds = rd.from_arrow(media)
    out = pa.table(ds.map_batches(
        ImageFeatureStage(thumbnail=(6, 8)), batch_format="pyarrow",
        batch_size=4).to_pandas())
    assert out.num_rows == 8
    assert set(out["decoded_width"].to_pylist()) == {16}
    assert set(out["decoded_height"].to_pylist()) == {12}
    f = np.array(out["features"].to_pylist())
    assert f.shape == (8, ImageFeatureStage.FEATURE_DIM)
    assert np.allclose(f[:, 6:].sum(axis=1), 1.0)  # histogram normalized
    # thumbnails are themselves valid PPMs of the requested size
    t = decode_ppm(out["thumbnail"][0].as_py())
    assert t.shape == (6, 8, 3)
    # determinism
    again = pa.table(rd.from_arrow(synthesize_ppm_media(8, width=16, height=12))
                     .map_batches(ImageFeatureStage(), batch_format="pyarrow")
                     .to_pandas())
    assert np.allclose(np.array(again["features"].to_pylist()), f)


def test_png_roundtrip_and_all_filter_types():
    import struct
    import zlib

    import numpy as np

    from nifi_processors_ray.stages.multimodal import (_PNG_SIG, _png_chunk,
                                                       decode_image,
                                                       decode_png, encode_png)

    rng = np.random.Generator(np.random.PCG64(7))
    rgb = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    assert np.array_equal(decode_png(encode_png(gray)), gray)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)

    # hand-filtered scanlines exercise ALL FIVE filter types against a
    # straight reference implementation of the PNG spec
    h, w, ch = 5, 6, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)

    def filt_scanlines():
        out = bytearray()
        prev = np.zeros(w * ch, dtype=np.int16)
        for y, ftype in enumerate([0, 1, 2, 3, 4]):
            cur = img[y].reshape(-1).astype(np.int16)
            line = np.zeros(w * ch, dtype=np.int16)
            for i in range(w * ch):
                left = cur[i - ch] if i >= ch else 0
                up = prev[i]
                ul = prev[i - ch] if i >= ch else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = left
                elif ftype == 2:
                    pred = up
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    cands = [(abs(p - left), left), (abs(p - up), up),
                             (abs(p - ul), ul)]
                    pred = min(cands, key=lambda t: t[0])[1]
                line[i] = (cur[i] - pred) % 256
            out.append(ftype)
            out.extend(line.astype(np.uint8).tobytes())
            prev = cur
        return bytes(out)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(filt_scanlines()))
               + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), img)

    # decode_image dispatch: gray expands to RGB, RGBA drops alpha
    assert decode_image(encode_png(gray)).shape == (6, 9, 3)
    assert np.array_equal(decode_image(encode_png(rgba)), rgba[:, :, :3])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    with _pytest.raises(ValueError, match="unrecognized image"):
        decode_image(b"GIF89a....")
    # SOI magic now dispatches to the real JPEG decoder, which rejects
    # truncation loudly instead of mis-decoding
    with _pytest.raises(ValueError, match="truncated JPEG"):
        decode_image(b"\xff\xd8\xff")


def test_png_media_pipeline_matches_ppm_pixels():
    """The PNG synth pipeline produces the SAME pixels as the PPM twin
    (same gradient family), so ImageFeatureStage features are identical —
    pinning the real compressed decode path against the raw one."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nifi_processors_ray.stages.multimodal import (ImageFeatureStage,
                                                       decode_image,
                                                       synthesize_png_media,
                                                       synthesize_ppm_media)

    png = synthesize_png_media(6, width=16, height=12)
    ppm = synthesize_ppm_media(6, width=16, height=12)
    for i in range(6):
        assert np.array_equal(decode_image(png["payload"][i].as_py()),
                              decode_image(ppm["payload"][i].as_py()))
    out = pa.table(rd.from_arrow(png).map_batches(
        ImageFeatureStage, batch_format="pyarrow", batch_size=3,
        concurrency=2).to_pandas())
    base = pa.table(rd.from_arrow(ppm).map_batches(
        ImageFeatureStage, batch_format="pyarrow", batch_size=3,
        concurrency=2).to_pandas())
    assert np.allclose(np.array(out["features"].to_pylist()),
                       np.array(base["features"].to_pylist()))
    assert set(out["decoded_width"].to_pylist()) == {16}


def test_wav_roundtrip_and_audio_features():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nifi_processors_ray.stages.multimodal import (
        AudioFeatureStage,
        decode_wav,
        encode_wav,
        synthesize_wav_media,
    )

    t = np.arange(4000) / 8000.0
    wave = (np.sin(2 * np.pi * 440 * t) * 30000).astype(np.int16)
    s, rate = decode_wav(encode_wav(wave, sample_rate=8000))
    assert rate == 8000
    assert np.array_equal(s[:, 0], wave)

    media = synthesize_wav_media(6, seconds=0.25, sample_rate=8000)
    out = pa.table(rd.from_arrow(media).map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=3,
        concurrency=2).to_pandas())
    assert out.num_rows == 6
    f = np.array(out["features"].to_pylist())
    assert f.shape == (6, AudioFeatureStage.FEATURE_DIM)
    # pure sines: strong rms, centroid between f0 and 2*f0 (the harmonic)
    assert (f[:, 0] > 0.3).all()
    assert ((f[:, 2] > 150) & (f[:, 2] < 2200)).all()
    assert np.allclose(out["duration_sec"].to_pylist(), 0.25)


def test_y4m_roundtrip_and_frame_sampling():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nifi_processors_ray.stages.multimodal import (
        Y4MFrameSampleStage,
        decode_ppm,
        decode_y4m,
        encode_y4m,
        synthesize_y4m_media,
    )

    rng = np.random.Generator(np.random.PCG64(6))
    frames = rng.integers(0, 256, size=(5, 8, 12), dtype=np.uint8)
    assert np.array_equal(decode_y4m(encode_y4m(frames)), frames)

    media = synthesize_y4m_media(4, width=16, height=12, n_frames=6)
    out = pa.table(rd.from_arrow(media).map_batches(
        Y4MFrameSampleStage(every=2), batch_format="pyarrow",
        batch_size=2, concurrency=2).to_pandas())
    # every 2nd of 6 frames -> 3 frames per clip
    assert out.num_rows == 4 * 3
    assert sorted(set(out["frame_idx"].to_pylist())) == [0, 2, 4]
    # sampled frames are valid PPMs with the clip's real pixels
    img = decode_ppm(out["frame_payload"][0].as_py())
    assert img.shape == (12, 16, 3)
    clip0 = decode_y4m(media["payload"][0].as_py())
    assert np.array_equal(img[:, :, 0], clip0[0])


def test_resize_bilinear_physics():
    import numpy as np

    from nifi_processors_ray.stages.multimodal import (resize_bilinear,
                                                       resize_nearest)

    # constant image stays constant under any resize
    const = np.full((10, 8, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(const, 5, 13) == 77).all()
    # identity resize returns the image
    rng = np.random.Generator(np.random.PCG64(9))
    img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    assert np.array_equal(resize_bilinear(img, 12, 9), img)
    # a horizontal ramp downsampled 2x keeps monotone ramp values
    ramp = np.tile(np.arange(0, 256, 16, dtype=np.uint8)[None, :, None],
                   (4, 1, 3))
    small = resize_bilinear(ramp, 4, 8)
    row = small[0, :, 0].astype(int)
    assert (np.diff(row) > 0).all()
    # grayscale path preserves shape
    g = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    assert resize_bilinear(g, 3, 4).shape == (3, 4)
    # interpolation averages where nearest snaps: 2x2 checkerboard -> 1x1
    cb = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    assert resize_bilinear(cb, 1, 1)[0, 0] in (127, 128)
    assert resize_nearest(cb[:, :, None].repeat(3, 2), 1, 1).shape == (1, 1, 3)


def test_tfidf_matches_bruteforce_both_paths():
    import math

    import ray.data as rd

    from nifi_processors_ray.stages.textstats import tfidf

    docs = [
        (0, "a b a c"),
        (1, "b b d"),
        (2, "a  d   d"),   # extra whitespace collapses
        (3, ""),           # empty doc: no pairs
    ]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs]})
    n_docs = len(docs)
    tf = {}
    for d, t in docs:
        for w in t.split():
            tf[(d, w)] = tf.get((d, w), 0) + 1
    dfc = {}
    for (d, w) in tf:
        dfc[w] = dfc.get(w, 0) + 1
    want = sorted((d, w, c, dfc[w], c * math.log(n_docs / dfc[w]))
                  for (d, w), c in tf.items())

    for budget in (None, 1):  # broadcast path, then bucket_join fallback
        out = tfidf(rd.from_arrow(tbl),
                    max_broadcast_bytes=budget).to_pandas()
        got = sorted(zip(out["doc_id"], out["token"], out["tf"], out["df"],
                         out["tfidf"]))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[:4] == w[:4]
            assert abs(g[4] - w[4]) < 1e-12


def test_unigram_logprob_matches_bruteforce_both_paths():
    import math

    import ray.data as rd

    from nifi_processors_ray.stages.textstats import unigram_logprob

    docs = [
        (0, "a b a c"),
        (1, "b b d"),
        (2, "a  d   d"),
        (3, ""),           # empty doc: dropped (no tokens)
    ]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs])})
    freq = {}
    for _, t in docs:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    total = sum(freq.values())
    want = {}
    for d, t in docs:
        toks = t.split()
        if toks:
            want[d] = (sum(math.log(freq[w] / total) for w in toks)
                       / len(toks), len(toks))

    for budget in (None, 1):  # broadcast path, then bucket_join fallback
        out = unigram_logprob(rd.from_arrow(tbl),
                              max_broadcast_bytes=budget).to_pandas()
        got = {int(r.doc_id): (r.unigram_logprob, int(r.n_tok))
               for r in out.itertuples()}
        assert set(got) == set(want)
        for d in want:
            assert got[d][1] == want[d][1]
            assert abs(got[d][0] - want[d][0]) < 1e-12, d


def test_chunk_text_windows_and_edges():
    import pytest

    from nifi_processors_ray.stages.textclean import chunk_text

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["abcdefghij", "", None, "héllo wörld!"]),
    })
    out = chunk_text(t, size=4, overlap=1)  # stride 3
    rows = sorted(zip(out["doc_id"].to_pylist(), out["chunk_id"].to_pylist(),
                      out["chunk"].to_pylist()))
    # doc 0: len 10, stride 3 -> ceil(10/3)=4 chunks at 0,3,6,9
    assert [(c, s) for d, c, s in rows if d == 0] == \
        [(0, "abcd"), (1, "defg"), (2, "ghij"), (3, "j")]
    # consecutive chunks overlap by exactly `overlap` chars
    assert rows[1][2][:1] == rows[0][2][-1:]
    # empty and null docs each yield one empty chunk (no silent row loss)
    assert [(c, s) for d, c, s in rows if d == 1] == [(0, "")]
    assert [(c, s) for d, c, s in rows if d == 2] == [(0, "")]
    # non-ASCII: codepoint windows, never split bytes
    assert [(c, s) for d, c, s in rows if d == 3] == \
        [(0, "héll"), (1, "lo w"), (2, "wörl"), (3, "ld!")]
    # reconstruction: stripping the overlap from chunk j>0 and concatenating
    # rebuilds the document
    doc0 = rows[0][2] + "".join(s[1:] for _, c, s in rows[1:4])
    assert doc0 == "abcdefghij"
    with pytest.raises(ValueError):
        chunk_text(t, size=4, overlap=4)


def test_inverted_index_matches_bruteforce_with_cap():
    import ray.data as rd

    from nifi_processors_ray.stages.textstats import inverted_index

    docs = [(i, ("common " + f"tok{i % 7} " + ("dup " if i % 2 else ""))
             * 2) for i in range(40)]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs])})
    want = {}
    for d, t in docs:
        for w in set(t.split()):
            want.setdefault(w, []).append(d)
    cap = 8
    want = {w: sorted(ids)[:cap] for w, ids in want.items()}

    ds = rd.from_arrow(tbl).repartition(5)
    out = inverted_index(ds, id_col="doc_id", text_col="text",
                         max_postings=cap).to_pandas()
    got = {r.token: (int(r.n_postings), r.postings)
           for r in out.itertuples()}
    assert set(got) == set(want)
    for w, ids in want.items():
        assert got[w] == (len(ids), ",".join(str(i) for i in ids)), w


def test_textstats_fast_paths_match_distributed():
    """token_frequencies / unigram_logprob / tfidf / inverted_index driver
    fast paths share the tokenize kernel and lookup math with the
    distributed pipelines — outputs must be identical up to float
    round-off (small_bytes=0 forces the distributed path)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from nifi_processors_ray.stages.textstats import (inverted_index,
                                                      token_frequencies,
                                                      tfidf, unigram_logprob)

    texts = ["the cat sat", "the dog", "", "cat cat cat", "a b c the"] * 8
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(3)

    cases = [
        (token_frequencies, dict(top_k=5), ["token"]),
        (unigram_logprob, {}, ["doc_id"]),
        (tfidf, {}, ["doc_id", "token"]),
        (inverted_index, dict(max_postings=3), ["token"]),
    ]
    for fn, kw, keys in cases:
        fast = fn(ds, **kw).to_pandas()
        slow = fn(ds, small_bytes=0, **kw).to_pandas()
        fast = fast.sort_values(keys).reset_index(drop=True)[sorted(fast.columns)]
        slow = slow.sort_values(keys).reset_index(drop=True)[sorted(slow.columns)]
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False,
                                      rtol=1e-12, atol=1e-12)
