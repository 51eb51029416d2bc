import numpy as np
import pandas as pd
import pytest


def _vectors(ray_session, n=600, dim=32, seed=0):
    import ray.data

    rng = np.random.RandomState(seed)
    # clustered vectors so IVF has structure
    centers = rng.standard_normal((8, dim)) * 3
    rows = []
    for i in range(n):
        c = centers[i % 8]
        rows.append({"vec_id": i, "embedding": (c + rng.standard_normal(dim)).tolist()})
    return ray.data.from_items(rows)


def test_brute_force_topk_exact(ray_session):
    from geotools_ray.ops.ann import brute_force_topk

    ds = _vectors(ray_session)
    df = ds.to_pandas()
    E = np.stack([np.asarray(v) for v in df["embedding"]])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    rng = np.random.RandomState(1)
    Q = rng.standard_normal((3, 32))
    out = brute_force_topk(ds, Q, np.arange(3), k=5).to_pandas()
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    for q in range(3):
        sims = En @ Qn[q]
        want = np.lexsort((df["vec_id"].to_numpy(), -sims))[:5]
        got = out[out["q_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        np.testing.assert_array_equal(got, df["vec_id"].to_numpy()[want])


def test_ivf_recall(ray_session):
    from geotools_ray.ops.ann import brute_force_topk, ivf_topk

    ds = _vectors(ray_session, n=800)
    rng = np.random.RandomState(2)
    Q = rng.standard_normal((10, 32))
    qids = np.arange(10)
    exact = brute_force_topk(ds, Q, qids, k=10).to_pandas()
    approx = ivf_topk(ds, Q, qids, k=10, nlist=16, nprobe=6).to_pandas()
    recalls = []
    for q in range(10):
        e = set(exact[exact["q_id"] == q]["vec_id"])
        a = set(approx[approx["q_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8  # scale path trades little recall


def test_ivf_topk_pretrained_centroids_exceed_default_nlist(ray_session):
    """Regression: ivf_topk sized the probe inversion with the nlist
    PARAMETER; pre-trained centroids with len(C) > nlist probed bucket
    ids past the inversion list -> IndexError. Exhaustive probing over
    the larger centroid set must also equal exact."""
    from geotools_ray.ops.ann import brute_force_topk, ivf_topk, _norm_rows

    ds = _vectors(ray_session, n=400)
    rng = np.random.RandomState(3)
    C = _norm_rows(rng.standard_normal((32, 32)))  # len(C)=32 > default nlist=16
    Q = rng.standard_normal((4, 32))
    qids = np.arange(4)
    out = ivf_topk(ds, Q, qids, k=10, nprobe=32, centroids=C).to_pandas()
    exact = brute_force_topk(ds, Q, qids, k=10).to_pandas()
    for q in range(4):
        got = out[out["q_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        want = exact[exact["q_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        np.testing.assert_array_equal(got, want)


def test_audio_stage_plumbing(ray_session):
    import pyarrow as pa
    import ray.data

    from geotools_ray.stages.multimodal import AUDIO_SCHEMA, AudioFeatureStage

    rows = [
        {
            "clip_id": f"clip{i}",
            "bytes": bytes([i % 256] * 64),
            "sample_rate": 16000,
            "n_samples": 16000,
            "fmt": "wav",
        }
        for i in range(50)
    ]
    t = pa.Table.from_pylist(rows, schema=AUDIO_SCHEMA)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=16,
        concurrency=2,
        fn_constructor_kwargs={"deterministic_fake": True},
    ).to_pandas()
    assert len(out) == 50
    assert {"rms", "zcr"} <= set(out.columns)
    assert "bytes" not in out.columns  # payload dropped before any shuffle
    # deterministic across runs
    out2 = ds.map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=16, concurrency=2,
        fn_constructor_kwargs={"deterministic_fake": True},
    ).to_pandas()
    m1 = out.sort_values("clip_id")["rms"].to_numpy()
    m2 = out2.sort_values("clip_id")["rms"].to_numpy()
    np.testing.assert_allclose(m1, m2)


def test_audio_real_codec_raises():
    import pyarrow as pa

    from geotools_ray.stages.multimodal import AudioFeatureStage

    stage = AudioFeatureStage(deterministic_fake=False)
    t = pa.table(
        {
            "clip_id": ["a"],
            "bytes": [b"xx"],
            "sample_rate": pa.array([16000], pa.int32()),
            "n_samples": pa.array([100], pa.int64()),
            "fmt": ["mp3"],
        }
    )
    with pytest.raises(NotImplementedError):
        stage(t)


def test_video_frame_sampling(ray_session):
    import pyarrow as pa
    import ray.data

    from geotools_ray.stages.multimodal import VIDEO_SCHEMA, VideoFrameSampleStage

    rows = [
        {
            "video_id": f"v{i}",
            "bytes": bytes([i] * 32),
            "w": 64,
            "h": 48,
            "fps": 30.0,
            "n_frames": 90,
            "fmt": "h264",
        }
        for i in range(10)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=VIDEO_SCHEMA))
    out = ds.map_batches(
        VideoFrameSampleStage,
        batch_format="pyarrow",
        batch_size=4,
        concurrency=2,
        fn_constructor_kwargs={"stride": 30, "deterministic_fake": True},
    ).to_pandas()
    # 3 sampled frames (0, 30, 60) per video
    assert len(out) == 30
    assert sorted(out["frame"].unique()) == [0, 30, 60]


def test_ivf_index_partition_pruning(ray_session, tmp_path):
    """The bucket-partitioned index reads ONLY the probed buckets."""
    import pyarrow.dataset as pads

    from geotools_ray.ops.ann import (
        brute_force_topk, build_ivf_index, ivf_topk_index, _norm_rows,
    )

    ds = _vectors(ray_session, n=800)
    path = str(tmp_path / "ivf")
    C = build_ivf_index(ds, nlist=16, path=path)
    rng = np.random.RandomState(2)
    Q = rng.standard_normal((10, 32))
    qids = np.arange(10)
    nprobe = 6
    out = ivf_topk_index(path, C, Q, qids, k=10, nprobe=nprobe).to_pandas()

    # recall vs exact
    exact = brute_force_topk(ds, Q, qids, k=10).to_pandas()
    recalls = []
    for q in range(10):
        e = set(exact[exact["q_id"] == q]["vec_id"])
        a = set(out[out["q_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8

    # storage pruning: a 2-query, 3-probe lookup reads only its
    # probed buckets' rows — a strict subset of the corpus
    qn = _norm_rows(Q[:2])
    probes = np.argsort(-(qn @ C.T), axis=1)[:, :3]
    needed = sorted({int(b) for row in probes for b in row})
    assert len(needed) < 16
    out2 = ivf_topk_index(path, C, Q[:2], qids[:2], k=10, nprobe=3)
    total = pads.dataset(path, partitioning="hive").count_rows()
    probed = pads.dataset(path, partitioning="hive").count_rows(
        filter=pads.field("bucket").isin(needed)
    )
    assert total == 800 and probed < total
    assert len(out2.to_pandas()) == 20


def test_ivf_exhaustive_probe_equals_exact(ray_session):
    from geotools_ray.ops.ann import brute_force_topk, ivf_topk

    ds = _vectors(ray_session, n=500)
    rng = np.random.RandomState(7)
    Q = rng.standard_normal((4, 32))
    qids = np.arange(4)
    exact = brute_force_topk(ds, Q, qids, k=10).to_pandas()
    full = ivf_topk(ds, Q, qids, k=10, nlist=8, nprobe=8).to_pandas()
    cols = ["q_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(
        exact[cols].sort_values(cols).reset_index(drop=True),
        full[cols].sort_values(cols).reset_index(drop=True),
    )


def test_embedding_near_dup_lsh(ray_session):
    """Planted high-cosine near-dups are all found (LSH recall at
    cos>=0.9 is ~1); no false positives vs the exact pair set."""
    import ray.data

    from geotools_ray.ops.ann import embedding_near_dup_pairs

    rng = np.random.RandomState(11)
    base = rng.standard_normal((40, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": v.tolist()})
    # plant near-dups: ids 100+i are tiny perturbations of i (cos ~ .999)
    for i in range(10):
        rows.append({"vec_id": 100 + i,
                     "embedding": (base[i] + 0.01 * rng.standard_normal(32)).tolist()})
    ds = ray.data.from_items(rows)
    out = embedding_near_dup_pairs(ds, threshold=0.9).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    # exact reference
    E = np.stack([np.asarray(r["embedding"]) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En @ En.T
    want = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if S[a, b] >= 0.9:
                want.add((min(ids[a], ids[b]), max(ids[a], ids[b])))
    assert got == want
    assert all((i, 100 + i) in got for i in range(10))


def test_ivfpq_exact_configuration_equals_brute_force(ray_session):
    """nprobe = nlist + rerank >= corpus: the shortlist covers every
    id and the rerank is exact-cosine, so IVF-PQ reproduces the
    brute-force ranks exactly (the registered ann_ivfpq config)."""
    from geotools_ray.ops.ann import brute_force_topk, ivfpq_topk

    ds = _vectors(ray_session, n=500)
    rng = np.random.RandomState(7)
    Q = rng.standard_normal((4, 32))
    qids = np.arange(4)
    exact = brute_force_topk(ds, Q, qids, k=10).to_pandas()
    full = ivfpq_topk(
        ds, Q, qids, k=10, nlist=8, m=8, nbits=5, nprobe=8, rerank=500
    ).to_pandas()
    cols = ["q_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(
        exact[cols].sort_values(cols).reset_index(drop=True),
        full[cols].sort_values(cols).reset_index(drop=True),
    )


def test_ivfpq_pruned_recall(ray_session):
    """The memory-scale tier (pruned probes, small rerank) keeps high
    recall on clustered data."""
    from geotools_ray.ops.ann import brute_force_topk, ivfpq_topk

    ds = _vectors(ray_session, n=800)
    rng = np.random.RandomState(2)
    Q = rng.standard_normal((10, 32))
    qids = np.arange(10)
    exact = brute_force_topk(ds, Q, qids, k=10).to_pandas()
    approx = ivfpq_topk(
        ds, Q, qids, k=10, nlist=16, m=8, nbits=6, nprobe=6, rerank=60
    ).to_pandas()
    recalls = []
    for q in range(10):
        e = set(exact[exact["q_id"] == q]["vec_id"])
        a = set(approx[approx["q_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8


def test_ivfpq_index_compression_and_pruning(ray_session, tmp_path):
    """The stored index carries m uint8 code bytes per vector (not the
    raw dim x float), reads only the probed buckets' partitions, and
    searching it matches the single-pass ivfpq_topk."""
    import pyarrow.dataset as pads

    from geotools_ray.ops.ann import (
        _norm_rows, build_ivfpq_index, ivfpq_topk, ivfpq_topk_index,
    )

    ds = _vectors(ray_session, n=800)
    path = str(tmp_path / "ivfpq")
    m = 8
    C, books = build_ivfpq_index(ds, nlist=16, path=path, m=m, nbits=6)
    assert books.shape == (m, 64, 32 // m)

    idx = pads.dataset(path, partitioning="hive")
    t = idx.to_table()
    assert t.num_rows == 800
    # compression: the code column is a fixed-size list of m uint8
    code_t = t.schema.field("code").type
    import pyarrow as pa

    assert pa.types.is_fixed_size_list(code_t) and code_t.list_size == m
    assert pa.types.is_uint8(code_t.value_type)

    rng = np.random.RandomState(2)
    Q = rng.standard_normal((6, 32))
    qids = np.arange(6)
    nprobe = 5
    got = ivfpq_topk_index(
        path, C, books, ds, Q, qids, k=10, nprobe=nprobe, rerank=60
    ).to_pandas()
    want = ivfpq_topk(
        ds, Q, qids, k=10, nlist=16, m=m, nbits=6, nprobe=nprobe, rerank=60,
        centroids=C, codebooks=books,
    ).to_pandas()
    cols = ["q_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
    )

    # storage pruning: the probed buckets are a strict subset
    qn = _norm_rows(Q[:2])
    probes = np.argsort(-(qn @ C.T), axis=1)[:, :3]
    needed = sorted({int(b) for row in probes for b in row})
    assert len(needed) < 16
    probed = idx.count_rows(filter=pads.field("bucket").isin(needed))
    assert probed < 800


def test_ivfpq_determinism(ray_session):
    """Same input, two runs -> identical output (hash-sample training,
    linspace init, fixed Lloyd iterations — no RNG state anywhere)."""
    from geotools_ray.ops.ann import ivfpq_topk

    ds = _vectors(ray_session, n=400)
    rng = np.random.RandomState(5)
    Q = rng.standard_normal((3, 32))
    qids = np.arange(3)
    a = ivfpq_topk(ds, Q, qids, k=5, nlist=8, m=4, nbits=5, nprobe=3, rerank=30).to_pandas()
    b = ivfpq_topk(ds, Q, qids, k=5, nlist=8, m=4, nbits=5, nprobe=3, rerank=30).to_pandas()
    cols = ["q_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_audio_fixture_cycles_wav_formats(ray_session):
    """The audio table genuinely contains 8/24/32-bit and float32
    clips, and the REAL decode path (AudioFeatureStage over RIFF
    payloads) produces features for every one of them."""
    import struct

    import ray.data

    from geotools_ray.stages.multimodal import (AudioFeatureStage,
                                                audio_clip_lens, audio_rows)

    lens = audio_clip_lens(16, seed=7)
    t = audio_rows(np.arange(16), lens)
    seen = set()
    for b in t["bytes"].to_pylist():
        fi = b.find(b"fmt ")
        tag, _, _, _, _, bps = struct.unpack("<HHIIHH", b[fi + 8 : fi + 24])
        seen.add((tag, bps))
    assert seen == {(1, 8), (1, 16), (1, 24), (1, 32), (3, 32)}
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            AudioFeatureStage, batch_format="pyarrow", batch_size=8,
            concurrency=1,
        )
        .to_pandas()
    )
    assert len(out) == 16 and (out["rms"] > 0).all()


def test_video_stage_handles_c420_streams():
    """A C420 video (the dominant real-world y4m layout) samples
    through the stage with the same luma means as its 444 encoding
    (luma is untouched by chroma subsampling)."""
    import pyarrow as pa

    from geotools_ray.sources import codecs as C
    from geotools_ray.stages.multimodal import VideoFrameSampleStage

    rng = np.random.RandomState(8)
    frames = rng.randint(0, 256, size=(61, 3, 16, 16)).astype(np.uint8)
    rows = []
    for fmtname, cs in (("a444", "444"), ("a420", "420")):
        data = C.encode_y4m(frames, fps=30.0, colourspace=cs)
        rows.append({
            "video_id": fmtname, "bytes": data, "w": 16, "h": 16,
            "fps": 30.0, "n_frames": 61, "fmt": "y4m",
        })
    t = pa.Table.from_pylist(rows)
    out = VideoFrameSampleStage(stride=30)(t).to_pandas()
    a = out[out["video_id"] == "a444"].sort_values("frame")["mean_luma"].to_numpy()
    b = out[out["video_id"] == "a420"].sort_values("frame")["mean_luma"].to_numpy()
    assert len(a) == 3 and np.allclose(a, b)
