"""Governance suite: hashing, dedup modes, leakage, normalize, manifest, VQA."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from mmrs_tpu.govern import dedup, hashing, manifest, normalize, vqa
from mmrs_tpu.govern.union_report import (
    UnionSample,
    combined_metrics,
    save_union_samples,
)


def _img(color, size=(64, 48), noise=None, seed=0):
    arr = np.zeros((size[1], size[0], 3), np.uint8)
    arr[..., :] = color
    if noise:
        rng = np.random.default_rng(seed)
        arr = np.clip(
            arr.astype(int) + rng.integers(-noise, noise, arr.shape), 0, 255
        ).astype(np.uint8)
    return Image.fromarray(arr)


def _gradient_img(seed=0, size=(64, 64)):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (8, 8, 3), np.uint8)
    return Image.fromarray(base).resize(size, Image.BILINEAR)


# -- hashing ---------------------------------------------------------------

def test_hashes_stable_and_discriminative():
    a = _gradient_img(0)
    b = _gradient_img(1)
    ha, hb = hashing.perceptual_hashes(a), hashing.perceptual_hashes(b)
    assert hashing.compare_hashes(ha, hashing.perceptual_hashes(a))
    assert not hashing.compare_hashes(ha, hb)


def test_phash_robust_to_recompression(tmp_path):
    img = _gradient_img(2, (128, 128))
    p1 = tmp_path / "a.png"
    p2 = tmp_path / "a.jpg"
    img.save(p1)
    img.save(p2, quality=70)
    h1 = hashing.phash(Image.open(p1))
    h2 = hashing.phash(Image.open(p2))
    assert hashing.hamming(h1, h2) <= 5


def test_packed_hamming_matches_scalar():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**63, 10, dtype=np.uint64)
    b = rng.integers(0, 2**63, 7, dtype=np.uint64)
    d = hashing.packed_hamming(a, b)
    for i in range(10):
        for j in range(7):
            assert d[i, j] == hashing.hamming(a[i], b[j])


# -- dedup -----------------------------------------------------------------

@pytest.fixture()
def dup_tree(tmp_path):
    ref = tmp_path / "ref"; ref.mkdir()
    tgt = tmp_path / "tgt"; tgt.mkdir()
    img1 = _gradient_img(10)
    img2 = _gradient_img(11)
    img3 = _gradient_img(12)
    img1.save(ref / "a.png")
    img1.save(tgt / "a_copy.png")       # exact pixel dup of ref/a
    img2.save(tgt / "b.png")            # unique
    img3.save(tgt / "c.png")
    return ref, tgt


def test_exact_dedup_dry_run_then_delete(dup_tree):
    ref, tgt = dup_tree
    ref_paths = [str(p) for p in sorted(ref.iterdir())]
    tgt_paths = [str(p) for p in sorted(tgt.iterdir())]

    rep = dedup.exact_dedup(ref_paths, tgt_paths, dry_run=True)
    assert rep.num_duplicates == 1
    assert rep.duplicates[0][0].endswith("a_copy.png")
    assert os.path.exists(rep.duplicates[0][0])  # dry run didn't delete

    rep2 = dedup.exact_dedup(ref_paths, tgt_paths, dry_run=False)
    assert not os.path.exists(rep2.duplicates[0][0])
    assert os.path.exists(str(ref / "a.png"))    # keeper untouched


def test_perceptual_dedup_keeps_largest(tmp_path):
    img = _gradient_img(20, (128, 128))
    big = tmp_path / "big.jpg"
    small = tmp_path / "small.jpg"
    img.save(big, quality=98)
    img.save(small, quality=40)
    other = tmp_path / "other.jpg"
    _gradient_img(21, (128, 128)).save(other, quality=95)

    rep = dedup.perceptual_dedup([str(big), str(small), str(other)], dry_run=True)
    assert rep.num_duplicates == 1
    dup, keeper = rep.duplicates[0]
    assert dup.endswith("small.jpg") and keeper.endswith("big.jpg")


def test_leakage_removal_exact_dhash(tmp_path):
    train = tmp_path / "train"; train.mkdir()
    test = tmp_path / "test"; test.mkdir()
    leak = _gradient_img(30)
    leak.save(test / "t1.png")
    leak.save(train / "leaked.png")
    _gradient_img(31).save(train / "clean.png")

    rep = dedup.leakage_removal(
        [str(p) for p in sorted(train.iterdir())],
        [str(p) for p in sorted(test.iterdir())],
        dry_run=True,
    )
    assert [d for d, _ in rep.duplicates] == [str(train / "leaked.png")]


def test_embedding_dedup_chain_resolution():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x[20] = x[5]
    x[40] = x[20]
    paths = [f"img{i}.jpg" for i in range(50)]
    rep = dedup.embedding_dedup(x, paths, tau=0.999, impl="xla")
    d = dict(rep.duplicates)
    assert d["img20.jpg"] == "img5.jpg"
    assert d["img40.jpg"] == "img5.jpg"  # chain resolved to ultimate keeper


# -- normalize / manifest ----------------------------------------------------

def test_convert_to_jpeg_flattens_alpha(tmp_path):
    rgba = np.zeros((10, 10, 4), np.uint8)
    rgba[..., 0] = 200
    rgba[..., 3] = 0  # fully transparent -> white after flatten
    Image.fromarray(rgba, "RGBA").save(tmp_path / "t.png")
    rep = normalize.convert_to_jpeg(str(tmp_path), dry_run=False)
    assert len(rep.converted) == 1
    out = np.asarray(Image.open(tmp_path / "t.jpg"))
    assert out.mean() > 240  # white background
    assert not (tmp_path / "t.png").exists()


def test_delete_non_jpeg_dry_run(tmp_path):
    _gradient_img(1).save(tmp_path / "keep.jpg")
    _gradient_img(2).save(tmp_path / "drop.png")
    rep = normalize.delete_non_jpeg(str(tmp_path), dry_run=True)
    assert [os.path.basename(p) for p in rep.deleted] == ["drop.png"]
    assert (tmp_path / "drop.png").exists()
    rep = normalize.delete_non_jpeg(str(tmp_path), dry_run=False)
    assert not (tmp_path / "drop.png").exists()
    assert (tmp_path / "keep.jpg").exists()


def test_canonical_rename_and_merge(tmp_path):
    for cls, n in [("cat", 3), ("猫", 2)]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(n):
            _gradient_img(i).save(d / f"whatever_{i}.jpg")

    rep = manifest.canonical_rename(str(tmp_path), dry_run=False)
    names = sorted(os.listdir(tmp_path / "cat"))
    assert names == ["cat1.jpg", "cat2.jpg", "cat3.jpg"]

    rep2 = manifest.merge_folders(str(tmp_path), {"猫": "cat"}, dry_run=False)
    assert not (tmp_path / "猫").exists()
    names = sorted(os.listdir(tmp_path / "cat"))
    assert names == [f"cat{i}.jpg" for i in range(1, 6)]
    assert rep2.moved


# -- VQA builders -------------------------------------------------------------

@pytest.fixture()
def img_classes():
    return {
        "cat": [f"cat/cat{i}.jpg" for i in range(6)],
        "dog": [f"dog/dog{i}.jpg" for i in range(4)],
        "horse": [f"horse/horse{i}.jpg" for i in range(5)],
    }


def test_v1_all_yes(img_classes, tmp_path):
    out = str(tmp_path / "v1.json")
    recs = vqa.build_v1(img_classes, out)
    assert len(recs) == 15
    assert all(r["conversations"][1]["value"] == "Yes" for r in recs)
    saved = json.load(open(out))
    assert len(saved) == 15
    assert all("_meta" not in r for r in saved)
    assert all(r["conversations"][0]["value"].startswith("<image>\n") for r in saved)


def test_v2_balanced_negatives(img_classes):
    recs = vqa.build_v2(img_classes, seed=1)
    bal = vqa.verify_balance(recs)
    for cls, counts in bal.items():
        assert counts["Yes"] == counts["No"], (cls, counts)
    # no (image, category) pair duplicated
    pairs = [(r["image"], vqa._category_of(r)) for r in recs]
    assert len(pairs) == len(set(pairs))


def test_v4_pools_and_ratio(img_classes, tmp_path):
    easy = [f"ez_negative/ez{i}.jpg" for i in range(20)]
    hard = {c: [f"{c}_negative/h{i}.jpg" for i in range(10)] for c in img_classes}
    out = vqa.build_v4(img_classes, easy, hard, out_dir=str(tmp_path), seed=2)
    min_count = 4  # dog has 4
    assert len(out.positives) == min_count * 3
    bal = vqa.verify_balance(out.positives)
    assert all(v["Yes"] == min_count for v in bal.values())
    # four files written
    assert len(out.files) == 4
    for p in out.files.values():
        assert os.path.exists(p)
    # cross negatives carry source balance metadata before save
    src_bal = vqa.verify_cross_negative_source_balance(out.with_cross)
    assert set(src_bal) <= set(img_classes)
    # saved files are stripped of _meta
    saved = json.load(open(out.files["with_hard"]))
    assert all("_meta" not in r for r in saved)


def test_v5_confusable_pairs(img_classes):
    imgs = dict(img_classes)
    imgs["lynx"] = [f"lynx/l{i}.jpg" for i in range(3)]
    recs = vqa.build_v5(imgs, {"lynx": "cat"})
    answers = {r["image"]: r["conversations"][1]["value"] for r in recs}
    assert all(answers[p] == "No" for p in imgs["lynx"])
    assert all(answers[p] == "Yes" for p in imgs["cat"])
    assert all("ONLY a single word" in r["conversations"][0]["value"] for r in recs)


# -- union report --------------------------------------------------------------

def test_union_report_and_metrics(tmp_path):
    src = tmp_path / "src"; src.mkdir()
    samples = []
    for i in range(6):
        p = src / f"s{i}.jpg"
        _gradient_img(i).save(p)
        samples.append(UnionSample(
            path=str(p), basename=f"s{i}.jpg",
            is_positive=(i < 3),
            en_sim=30.0 if i in (0, 1) else 10.0,    # EN catches 0,1
            cn_sim=12.0 if i in (2, 5) else 5.0,     # CN catches 2 and FP 5
        ))
    rep = save_union_samples(samples, "lychee", en_threshold=25.0,
                             cn_threshold=11.0, out_root=str(tmp_path / "out"))
    assert sorted(rep.union_basenames) == ["s0.jpg", "s1.jpg", "s2.jpg", "s5.jpg"]
    assert rep.en_pass == 2 and rep.cn_pass == 2 and rep.union_pass == 4
    m = rep.metrics
    assert (m.tp, m.fp, m.fn) == (3, 1, 0)
    # audit CSV exists with one row per union sample
    with open(rep.audit_csv) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 1 + 4
    # files copied
    assert sorted(os.listdir(tmp_path / "out" / "lychee")) == [
        "_file_details.csv", "s0.jpg", "s1.jpg", "s2.jpg", "s5.jpg",
    ]
    m2 = combined_metrics(samples, 25.0, 11.0)
    assert m2.f1 == m.f1


def test_parallel_hashing_matches_sequential(tmp_path):
    """Thread-pool hash iteration (VERDICT r1 Weak #6) preserves order,
    results, and error capture vs the sequential path."""
    from mmrs_tpu.govern.dedup import _iter_hashes
    from mmrs_tpu.govern.hashing import perceptual_hashes
    from PIL import Image
    import numpy as np

    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(p)
        paths.append(str(p))
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    paths.insert(5, str(bad))

    err_seq, err_par = [], []
    seq = list(_iter_hashes(paths, perceptual_hashes, err_seq, workers=1))
    par = list(_iter_hashes(paths, perceptual_hashes, err_par, workers=8))
    assert [p for p, _ in par] == [p for p, _ in seq]
    assert [(h.phash, h.dhash, h.whash) for _, h in par] == [
        (h.phash, h.dhash, h.whash) for _, h in seq]
    assert len(err_seq) == len(err_par) == 1
    assert err_par[0][0].endswith("bad.png")


def test_embedding_dedup_ragged_on_mesh():
    """embedding_dedup(mesh=...) at a non-divisible N: padded rows must not
    leak into the report."""
    import jax
    import numpy as np
    from mmrs_tpu.config import MeshConfig
    from mmrs_tpu.govern.dedup import embedding_dedup
    from mmrs_tpu.parallel import make_mesh

    rng = np.random.default_rng(1)
    n = 333
    x = rng.normal(size=(n, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x[300] = x[7]
    paths = [f"p{i}" for i in range(n)]
    rep = embedding_dedup(x, paths, tau=0.999, dry_run=True,
                          mesh=make_mesh(MeshConfig()), impl="xla")
    assert rep.duplicates == [("p300", "p7")]


def test_convert_to_jpeg_never_clobbers_existing_jpg(tmp_path):
    """photo.png next to a DISTINCT photo.jpg: converting must not
    overwrite the jpg (reported as an error, file untouched)."""
    from mmrs_tpu.govern.normalize import convert_to_jpeg

    png = tmp_path / "photo.png"
    jpg = tmp_path / "photo.jpg"
    Image.fromarray(np.full((8, 8, 3), 10, np.uint8)).save(png)
    Image.fromarray(np.full((8, 8, 3), 200, np.uint8)).save(jpg)
    original = jpg.read_bytes()

    rep = convert_to_jpeg(str(tmp_path), dry_run=False)
    assert jpg.read_bytes() == original
    assert png.exists()                      # source not removed either
    assert any("not overwriting" in msg for _, msg in rep.errors)
    # the dry run predicts the same outcome
    rep2 = convert_to_jpeg(str(tmp_path), dry_run=True)
    assert any("not overwriting" in msg for _, msg in rep2.errors)


def test_perceptual_dedup_keeps_transitive_nonmatches(tmp_path, monkeypatch):
    """Reference semantics (find_repeated_in_same_folder.py:82-90): files
    are compared against KEPT files only. A~B, B~C, A!~C must keep A and
    C and delete only B (the old first-match chain walk deleted C too)."""
    import mmrs_tpu.govern.dedup as dd
    from mmrs_tpu.govern.hashing import PerceptualHashes

    sizes = {"A.jpg": 300, "B.jpg": 200, "C.jpg": 100}
    for name, size in sizes.items():
        (tmp_path / name).write_bytes(b"x" * size)
    hashes = {
        "A.jpg": np.uint64(0),
        "B.jpg": np.uint64(0x7),          # d(A,B)=3 <= 5
        "C.jpg": np.uint64(0xF7),         # d(B,C)=4 <= 5, d(A,C)=7 > 5
    }

    def fake_hash_one(path, fn):
        h = hashes[os.path.basename(path)]
        return PerceptualHashes(phash=h, dhash=h, whash=h)

    monkeypatch.setattr(dd, "_hash_one", fake_hash_one)
    rep = dd.perceptual_dedup([str(tmp_path / n) for n in sizes],
                              threshold=5, dry_run=True)
    dups = {os.path.basename(d): os.path.basename(k)
            for d, k in rep.duplicates}
    assert dups == {"B.jpg": "A.jpg"}


def test_canonical_rename_real_run_matches_dry_run_plan(tmp_path):
    """The dry-run mapping is the approval artifact: the real run must
    assign the SAME final names, and the report must map ORIGINAL paths
    (not temp names) to finals."""
    from mmrs_tpu.govern.manifest import canonical_rename

    d = tmp_path / "cat"
    d.mkdir()
    contents = {}
    for name in ("zeta.jpg", "alpha.jpg", "mid.png"):
        data = name.encode() * 3
        (d / name).write_bytes(data)
        contents[name] = data

    plan = canonical_rename(str(tmp_path), dry_run=True)
    planned = {os.path.basename(s): os.path.basename(t)
               for s, t in plan.renamed}
    rep = canonical_rename(str(tmp_path), dry_run=False)
    got = {os.path.basename(s): os.path.basename(t)
           for s, t in rep.renamed}
    assert got == planned
    # and each renamed file holds its ORIGINAL bytes
    for src, dst in rep.renamed:
        assert (d / os.path.basename(dst)).read_bytes() \
            == contents[os.path.basename(src)]


def test_merge_folders_dry_run_predicts_shared_destination(tmp_path):
    """Two sources mapping to one destination: the dry run must emit the
    UNIQUE target names the real run produces (no colliding indexes)."""
    from mmrs_tpu.govern.manifest import merge_folders

    for src in ("m1", "m2"):
        d = tmp_path / src
        d.mkdir()
        for i in range(2):
            (d / f"{src}_{i}.jpg").write_bytes(b"j" * (i + 1))
    mapping = {"m1": "cat", "m2": "cat"}

    plan = merge_folders(str(tmp_path), mapping, dry_run=True)
    targets = [os.path.basename(t) for _, t in plan.moved]
    assert len(targets) == len(set(targets)) == 4

    real = merge_folders(str(tmp_path), mapping, dry_run=False,
                         resequence=False)
    assert [os.path.basename(t) for _, t in real.moved] == targets
    for _, t in real.moved:
        assert os.path.exists(t)


def test_union_samples_basename_collision_picks_passing_file(tmp_path):
    """pos and neg dirs can share a basename: the audit row and the
    copied file must be the sample that itself PASSES, not whichever
    came first (whose flags would contradict its own sims)."""
    pos = tmp_path / "pos"; pos.mkdir()
    neg = tmp_path / "neg"; neg.mkdir()
    p1 = pos / "0001.jpg"; _gradient_img(1).save(p1)
    p2 = neg / "0001.jpg"; _gradient_img(2).save(p2)
    samples = [
        UnionSample(path=str(p1), basename="0001.jpg", is_positive=True,
                    en_sim=10.0, cn_sim=5.0),          # fails both
        UnionSample(path=str(p2), basename="0001.jpg", is_positive=False,
                    en_sim=40.0, cn_sim=5.0),          # passes EN
    ]
    rep = save_union_samples(samples, "lychee", en_threshold=25.0,
                             cn_threshold=11.0,
                             out_root=str(tmp_path / "out"))
    with open(rep.audit_csv) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 2
    base, en_sim, cn_sim, en_pass, cn_pass, src_path = rows[1].split(",")
    assert float(en_sim) == 40.0 and en_pass == "1"    # self-consistent
    assert src_path == str(p2)                         # the PASSING file
    copied = (tmp_path / "out" / "lychee" / "0001.jpg").read_bytes()
    assert copied == p2.read_bytes()
