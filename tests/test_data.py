"""Data-layer tests: padding policies, protocol parsing, batchers, fixture."""

import numpy as np
import pytest

from aasist_tpu.data import dataset as D
from aasist_tpu.data import protocol as P
from aasist_tpu.data import synthetic


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_la")
    ids = synthetic.generate(root, n_train=12, n_dev=6, n_eval=8, seed=3)
    return root, ids


# ------------------------------------------------------------- pad policies
def test_pad_to_fixed_crops():
    x = np.arange(100000, dtype=np.float32)
    y = D.pad_to_fixed(x, 64600)
    assert y.shape == (64600,)
    assert (y == x[:64600]).all()


def test_pad_to_fixed_tiles():
    x = np.arange(100, dtype=np.float32)
    y = D.pad_to_fixed(x, 250)
    assert y.shape == (250,)
    assert (y[:100] == x).all() and (y[100:200] == x).all()
    assert (y[200:] == x[:50]).all()


def test_pad_random_crop_and_tile():
    rng = np.random.default_rng(0)
    long = np.arange(1000, dtype=np.float32)
    y = D.pad_random(long, 600, rng)
    assert y.shape == (600,)
    assert np.all(np.diff(y) == 1)  # contiguous crop
    short = np.arange(10, dtype=np.float32)
    y2 = D.pad_random(short, 25, rng)
    assert y2.shape == (25,)
    assert (y2[:10] == short).all()


def test_bucket_lengths_multiple_of_4():
    b = D.bucket_lengths(16000, 96000, 6)
    assert len(b) == 6
    assert (b % 4 == 0).all()
    assert b[0] == 16000 and b[-1] == 96000


def test_dynamic_chunk_duration():
    rng = np.random.default_rng(0)
    buckets = D.bucket_lengths(16000, 96000, 6)
    x = np.ones(30000, np.float32)
    for _ in range(5):
        y, dur = D.dynamic_chunk(x, rng, buckets)
        assert y.shape[0] in buckets
        assert dur == y.shape[0] / 16000.0


# ----------------------------------------------------------------- protocol
def test_protocol_roundtrip(fixture_dir):
    root, ids = fixture_dir
    entries = P.parse_protocol(
        root / "ASVspoof2019_LA_cm_protocols"
        / "ASVspoof2019.LA.cm.train.trn.txt")
    assert len(entries) == 12
    labels, files = P.labels_and_files(entries)
    assert files == ids["train"]
    # synthetic fixture alternates bonafide/spoof
    assert labels[files[0]] == 1 and labels[files[1]] == 0
    meta = P.trial_metadata(entries)
    assert meta[files[0]][1] == "bonafide"
    assert meta[files[1]][0].startswith("A")


# ----------------------------------------------------------------- batchers
def test_eval_batcher_shapes_and_masking(fixture_dir):
    root, ids = fixture_dir
    store = D.AudioStore(root / "ASVspoof2019_LA_eval")
    b = D.EvalBatcher(store, ids["eval"], batch_size=3)
    batches = list(b)
    assert len(b) == len(batches) == 3  # 8 utts / bs 3
    seen = []
    for x, utts, n_real in batches:
        assert np.asarray(x).shape == (3, 64600)
        seen.extend(utts[:n_real])
    assert seen == ids["eval"]
    assert batches[-1][2] == 2  # tail batch has 2 real rows


def test_train_batcher_determinism(fixture_dir):
    root, ids = fixture_dir
    store = D.AudioStore(root / "ASVspoof2019_LA_train")
    entries = P.parse_protocol(
        root / "ASVspoof2019_LA_cm_protocols"
        / "ASVspoof2019.LA.cm.train.trn.txt")
    labels, _ = P.labels_and_files(entries)
    b1 = D.TrainBatcher(store, ids["train"], labels, batch_size=4, seed=7)
    b2 = D.TrainBatcher(store, ids["train"], labels, batch_size=4, seed=7)
    for (x1, y1, d1), (x2, y2, d2) in zip(b1, b2):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # new epoch reshuffles
    b1.set_epoch(1)
    x_e1 = np.asarray(next(iter(b1))[0])
    b2.set_epoch(0)
    x_e0 = np.asarray(next(iter(b2))[0])
    assert x_e1.shape == x_e0.shape
    assert not np.array_equal(x_e1, x_e0)


def test_train_batcher_dcs_buckets(fixture_dir):
    root, ids = fixture_dir
    store = D.AudioStore(root / "ASVspoof2019_LA_train")
    entries = P.parse_protocol(
        root / "ASVspoof2019_LA_cm_protocols"
        / "ASVspoof2019.LA.cm.train.trn.txt")
    labels, _ = P.labels_and_files(entries)
    buckets = D.bucket_lengths(16000, 96000, 6)
    b = D.TrainBatcher(store, ids["train"], labels, batch_size=4, seed=7,
                       dcs_buckets=buckets)
    for x, y, dur in b:
        assert np.asarray(x).shape[1] in buckets
        assert np.allclose(np.asarray(dur),
                           np.asarray(x).shape[1] / 16000.0)


def test_missing_audio_raises(fixture_dir):
    root, _ = fixture_dir
    store = D.AudioStore(root / "ASVspoof2019_LA_train")
    with pytest.raises(FileNotFoundError):
        store.read("LA_T_does_not_exist")
