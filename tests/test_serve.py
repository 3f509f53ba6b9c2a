"""HTTP serving layer: healthz + text/image search over a tiny index."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from PIL import Image

    from mmrs_tpu.config import Config
    from mmrs_tpu.index.gallery import GalleryIndex, build_index
    from mmrs_tpu.io.dataset import FolderDataset
    from mmrs_tpu.models.tokenizer import CLIPTokenizer
    from mmrs_tpu.pipeline import build_towers
    from mmrs_tpu.search.engine import SearchEngine
    from mmrs_tpu.serve import SearchService, make_server
    import tempfile, os

    tmp = tempfile.TemporaryDirectory()
    root, out = os.path.join(tmp.name, "data"), os.path.join(tmp.name, "idx")
    rng = np.random.default_rng(0)
    blobs = {}
    for cls, color in [("red", (220, 30, 30)), ("blue", (30, 30, 220))]:
        os.makedirs(os.path.join(root, cls))
        for i in range(4):
            arr = np.clip(np.full((32, 32, 3), color, int)
                          + rng.integers(-20, 20, (32, 32, 3)), 0, 255)
            img = Image.fromarray(arr.astype(np.uint8))
            img.save(os.path.join(root, cls, f"{cls}{i}.jpg"))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            blobs[cls] = buf.getvalue()

    cfg = Config()
    cfg.model.image_tower = "vit_tiny"
    towers = build_towers(cfg, tokenizer=CLIPTokenizer(merges=[]))
    build_index(FolderDataset.from_root(root), towers.image_encode, out,
                batch_size=8)
    engine = SearchEngine(GalleryIndex.load(out), cfg.search)

    class ColorVerifier:
        """Answers by opening the (temp-file) image: yes iff mostly red.
        Exercises the /v1/verify blob->tempfile->Verifier path."""

        def __init__(self):
            self.calls = []

        def verify(self, image_path, category):
            self.calls.append((image_path, category))
            arr = np.asarray(Image.open(image_path).convert("RGB"), float)
            return bool(arr[..., 0].mean() > arr[..., 2].mean())

    verifier = ColorVerifier()
    srv = make_server(SearchService(engine, towers, verifier=verifier),
                      port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", blobs, verifier
    srv.shutdown()
    tmp.cleanup()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz(server):
    base, *_ = server
    h = _get(base + "/healthz")
    assert h["ok"] and h["rows"] == 8


def test_image_search_ranks_same_class_first(server):
    base, blobs, _ = server
    out = _post(base + "/v1/search",
                {"image_b64": base64.b64encode(blobs["red"]).decode(), "k": 3})
    hits = out["hits"][0]
    assert len(hits) == 3
    assert hits[0]["cls"] == "red" and hits[0]["score"] > hits[-1]["score"]


def test_text_search_and_batched(server):
    base, *_ = server
    out = _post(base + "/v1/search", {"texts": ["red thing", "blue thing"],
                                      "k": 2})
    assert len(out["hits"]) == 2 and all(len(h) == 2 for h in out["hits"])


def test_bad_request(server):
    base, *_ = server
    req = urllib.request.Request(
        base + "/v1/search", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_verify_endpoint_cascade(server):
    """/v1/verify: gate scores + survivor-only VLM verify over uploads."""
    base, blobs, verifier = server
    imgs = [base64.b64encode(blobs["red"]).decode(),
            base64.b64encode(blobs["blue"]).decode()]

    n0 = len(verifier.calls)
    out = _post(base + "/v1/verify",
                {"images_b64": imgs, "category": "red", "threshold": -1e9})
    res = out["results"]
    assert len(res) == 2 and all(r["gate_passed"] for r in res)
    assert res[0]["verified"] is True and res[1]["verified"] is False
    assert len(verifier.calls) - n0 == 2
    assert all(c[1] == "red" for c in verifier.calls[n0:])

    # gate rejects everything -> the VLM is never called, verified is null
    n1 = len(verifier.calls)
    out = _post(base + "/v1/verify",
                {"images_b64": imgs, "category": "red", "threshold": 1e9})
    res = out["results"]
    assert all(not r["gate_passed"] and r["verified"] is None for r in res)
    assert len(verifier.calls) == n1


def test_verify_images_fixed_packs():
    """Batched verifiers get FIXED-size packs (one compiled VLM shape per
    deployment, not one per survivor count) and results map back to the
    right images."""
    import io as _io

    from PIL import Image
    from mmrs_tpu.serve import SearchService

    def blob(v):
        buf = _io.BytesIO()
        Image.fromarray(np.full((8, 8, 3), v, np.uint8)).save(buf, "JPEG")
        return buf.getvalue()

    blobs = [blob(10 * i) for i in range(5)]

    class Towers:
        # scores 0..4 under logit_scale 1.0: embeddings = e_i scaled
        def image_encode(self, pixels):
            n = len(pixels)
            out = np.zeros((n, 8), np.float32)
            for i in range(n):
                out[i, 0] = float(i)
            return out

        def text_encode(self, texts):
            e = np.zeros((1, 8), np.float32)
            e[0, 0] = 1.0
            return e

    class PackVerifier:
        def __init__(self):
            self.packs = []

        def verify_batch(self, paths, category, fixed_batch=None):
            assert fixed_batch == 2
            self.packs.append(len(paths))
            # odd-indexed survivors verify True (by recorded order)
            return [j % 2 == 1 for j in range(len(paths))]

    pv = PackVerifier()
    svc = SearchService(engine=None, towers=Towers(), verifier=pv,
                        verify_batch=2, logit_scale=1.0)
    res = svc.verify_images(blobs, "cat", threshold=2.0)  # survivors: 2,3,4
    assert [r["gate_passed"] for r in res] == [False, False, True, True, True]
    assert pv.packs == [2, 1]          # fixed packs of verify_batch
    assert [r["verified"] for r in res] == [None, None, False, True, False]


def test_stats_endpoint(server):
    base, blobs, _ = server
    _post(base + "/v1/search",
          {"image_b64": base64.b64encode(blobs["red"]).decode(), "k": 2})
    out = _get(base + "/v1/stats")
    st = out["stages"]
    for stage in ("decode", "image_encode", "query"):
        assert stage in st and st[stage]["count"] >= 1, st
