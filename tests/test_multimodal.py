"""Multimodal plumbing: Arrow-batch mapInPandas decode path (oracle
parity covered in test_oracle_parity.py) and the deployment stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.pipeline import multimodal


def test_decode_meta_schema_and_determinism(spark, sf_smoke):
    df = multimodal.mm_decode_meta(spark, sf_smoke)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:int,first_byte:int,"
        "width:int,height:int,channels:int>"
    )
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, multimodal.mm_decode_meta(spark, sf_smoke).collect()))
    assert a == b  # deterministic across runs
    n_docs = table(spark, sf_smoke, "documents").count()
    assert len(a) == n_docs


def test_payload_bytes_match_text_length(spark, sf_smoke):
    """n_bytes is the utf-8 byte length of the text payload."""
    joined = (
        multimodal.mm_decode_meta(spark, sf_smoke)
        .join(table(spark, sf_smoke, "documents"), "doc_id")
        .withColumn("expect", F.octet_length(F.encode(F.col("text"), "utf-8")))
    )
    assert joined.filter(F.col("n_bytes") != F.col("expect")).count() == 0


def test_frame_sample_matches_bytewise_model(spark, sf_smoke):
    """Every sampled frame's (offset, sum) equals a direct byte-slice
    model of the payload; sampled indices are exactly the 0-mod-4 ones."""
    docs = {r.doc_id: r.text.encode("utf-8") for r in
            table(spark, sf_smoke, "documents").collect()}
    out = multimodal.mm_frame_sample(spark, sf_smoke).collect()
    seen: dict[int, set[int]] = {}
    for r in out:
        payload = docs[r.doc_id]
        assert r.frame_idx % multimodal.SAMPLE_EVERY == 0
        assert r.frame_offset == r.frame_idx * multimodal.FRAME_LEN
        chunk = payload[r.frame_offset : r.frame_offset + multimodal.FRAME_LEN]
        assert chunk, (r.doc_id, r.frame_idx)
        assert r.frame_sum == sum(chunk)
        seen.setdefault(r.doc_id, set()).add(r.frame_idx)
    for doc_id, payload in docs.items():
        n_frames = (len(payload) + multimodal.FRAME_LEN - 1) // multimodal.FRAME_LEN
        expect = set(range(0, n_frames, multimodal.SAMPLE_EVERY))
        assert seen.get(doc_id, set()) == expect, doc_id


def test_documents_are_ascii(spark, sf_oracle):
    """The frame-sample oracle equates byte k with ascii(substr(text,k+1,1)),
    which holds only for pure-ASCII text — assert that testdata property."""
    docs = table(spark, sf_oracle, "documents")
    non_ascii = docs.filter(
        F.octet_length(F.encode(F.col("text"), "utf-8")) != F.length("text")
    ).count()
    assert non_ascii == 0


def test_real_decode_rejects_codec_formats():
    """decode_image_real is a real header parser for PPM/BMP (r6);
    formats that need a codec library still fail loudly by magic."""
    with pytest.raises(ValueError, match="unknown image magic"):
        multimodal.decode_image_real(b"\x89PNG")


def test_audio_windows_overlap_and_cover(spark, sf_oracle):
    """Adjacent windows hop by AUDIO_HOP (50% overlap at the default
    sizes), every window except a doc's last is full-length, and the
    windows jointly cover every payload byte."""
    from distributed_graph_database_spark.pipeline import multimodal as mm

    rows = mm.mm_audio_windows(spark, sf_oracle).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.n_bytes
        for r in mm.mm_decode_meta(spark, sf_oracle).collect()
    }
    for doc_id, ws in by_doc.items():
        ws.sort(key=lambda r: r.win_idx)
        offs = [r.win_offset for r in ws]
        assert offs == [i * mm.AUDIO_HOP for i in range(len(ws))]
        n = docs[doc_id]
        # with 50% overlap the last ceil(WIN/HOP) windows may be ragged;
        # every window's length is exactly min(WIN, n - offset)
        for r in ws:
            assert r.win_len == min(mm.AUDIO_WIN, n - r.win_offset)
        last = ws[-1]
        assert last.win_offset + last.win_len == n
        assert last.win_offset + mm.AUDIO_HOP >= n  # full coverage


def test_decode_image_real_parses_hand_built_headers():
    """The real parser against inputs the synthesizer does NOT emit:
    a comment-bearing PPM header with extra whitespace, a top-down
    (negative-height) BMP, and a 16-bit-maxval PPM."""
    from distributed_graph_database_spark.pipeline.multimodal import (
        decode_image_real,
    )
    import struct

    ppm = b"P6\n# made by hand\n  640 # inline\n 480\n255\n" + b"\x00" * 10
    assert decode_image_real(ppm) == ("ppm", 640, 480, 24)

    ppm16 = b"P6\n2 2\n65535\n" + b"\x00" * 24
    assert decode_image_real(ppm16) == ("ppm", 2, 2, 48)

    bmp = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + 12, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, -2, 1, 24, 0, 24, 0, 0, 0, 0)
        + b"\x00" * 24
    )
    assert decode_image_real(bmp) == ("bmp", 3, 2, 24)

    import pytest

    with pytest.raises(ValueError):
        decode_image_real(b"\x89PNG\r\n")


def test_synthesized_images_roundtrip_through_real_decode(spark, sf_smoke):
    """mm_decode_real end to end at sf0.001: every synthesized file
    parses back to the dimensions its doc_id dictates, and the file
    sizes are internally consistent per format."""
    from distributed_graph_database_spark.pipeline import multimodal as mm

    rows = mm.mm_decode_real(spark, sf_smoke).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.format == ("ppm" if r.doc_id % 2 == 0 else "bmp")
        assert r.width == 4 + r.doc_id % 13
        assert r.height == 4 + r.doc_id % 11
        assert r.bpp == 24
        if r.format == "ppm":
            assert r.n_bytes > 3 * r.width * r.height
        else:
            assert r.n_bytes == 54 + ((3 * r.width + 3) // 4) * 4 * r.height


def test_phash_clusters_partition_the_pair_graph(spark, sf_smoke):
    """mm_phash_clusters must be exactly the connected components of
    the mm_phash_dedup pair graph: (a) both docs of every pair share a
    cluster, (b) cluster sizes sum to the pair graph's vertex count,
    (c) cluster_id is the minimum member (checked via an independent
    union-find over the collected pairs), and (d) no singleton
    clusters (every clustered doc is in ≥1 pair)."""
    from distributed_graph_database_spark.pipeline import multimodal as mm

    pairs = [
        (r.doc_a, r.doc_b)
        for r in mm.mm_phash_dedup(spark, sf_smoke).collect()
    ]
    clusters = {
        r.cluster_id: r.n_members
        for r in mm.mm_phash_clusters(spark, sf_smoke).collect()
    }
    assert pairs, "fixture corpus must produce near-dup pairs"

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want: dict = {}
    for v in parent:
        want[find(v)] = want.get(find(v), 0) + 1
    assert clusters == want
    assert all(n >= 2 for n in clusters.values())
    assert sum(clusters.values()) == len(parent)


def test_scene_cut_laws(spark, sf_oracle):
    """mm_scene_cut invariants: n_scenes = n_cuts + 1; first_cut set
    iff any cut; frame counts match the byte arithmetic (ceil(n/32));
    a single-frame doc can never cut; and the detector actually fires
    somewhere on the corpus."""
    from distributed_graph_database_spark.catalog import table
    from distributed_graph_database_spark.pipeline.multimodal import (
        FRAME_LEN,
        mm_scene_cut,
    )
    from pyspark.sql import functions as F

    rows = mm_scene_cut(spark, sf_oracle).collect()
    assert rows and any(r.n_cuts > 0 for r in rows)
    n_bytes = {
        r.doc_id: r.n
        for r in table(spark, sf_oracle, "documents")
        .select("doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_scenes == r.n_cuts + 1
        assert (r.first_cut is not None) == (r.n_cuts > 0)
        expect_frames = -(-n_bytes[r.doc_id] // FRAME_LEN)
        assert r.n_frames == expect_frames, (r.doc_id, r.n_frames, expect_frames)
        if r.n_frames == 1:
            assert r.n_cuts == 0
        if r.first_cut is not None:
            assert 1 <= r.first_cut < r.n_frames


def test_clip_filter_matches_independent_python_replay(spark, sf_smoke):
    """The r9 ops_graph_merge lesson: when Spark and the DuckDB oracle
    share a derivation, parity cannot falsify it — so the cross-modal
    gate is pinned here against an INDEPENDENT from-scratch replay:
    hashlib-md5 SimHash votes, _phash_bits over locally synthesized
    payloads, pure-Python hamming and per-source counting."""
    import hashlib
    from collections import defaultdict

    from distributed_graph_database_spark.pipeline.multimodal import (
        CLIP_BITS,
        CLIP_HAMMING_MAX,
        _phash_bits,
        _synth_image,
        mm_clip_filter,
    )

    docs = {
        r.doc_id: (r.text, r.source)
        for r in table(spark, sf_smoke, "documents").collect()
    }

    def simhash32(text: str) -> int:
        votes = [0] * 32
        for tok in text.strip().lower().split():
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
            for b in range(32):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(32) if votes[b] > 0)

    expect = defaultdict(lambda: [0, 0, 0, 0])  # n_pairs, keep, drop, sum_ham
    for doc_id, (text, source) in docs.items():
        if doc_id % 2 != 0:  # only PPM docs carry an image feature
            continue
        ph = _phash_bits(_synth_image(doc_id))
        tx = simhash32(text) & ((1 << CLIP_BITS) - 1)
        ham = bin(ph ^ tx).count("1")
        e = expect[source]
        e[0] += 1
        e[1 if ham <= CLIP_HAMMING_MAX else 2] += 1
        e[3] += ham

    got = {
        r.source: [r.n_pairs, r.n_keep, r.n_drop, r.sum_hamming]
        for r in mm_clip_filter(spark, sf_smoke).collect()
    }
    assert got == dict(expect)
    # the gate must be a real filter, not all-keep or all-drop
    assert sum(v[1] for v in got.values()) > 0
    assert sum(v[2] for v in got.values()) > 0
