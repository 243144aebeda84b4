"""Predictor serving path + visualization components."""
import os

import numpy as np
import pytest

import jax

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.core.smpl import save_model_npz
from human_pose_estimation_tpu.infer.predictor import Predictor
from human_pose_estimation_tpu.viz import renderer as viz
from human_pose_estimation_tpu.utils.image import preprocess_for_inference


@pytest.fixture(scope="module")
def predictor(tmp_path_factory, request):
    tiny = request.getfixturevalue("tiny_model")
    tmp = tmp_path_factory.mktemp("pred")
    save_model_npz(tiny, str(tmp / "model.npz"))
    cfg = Config(
        smpl_model_path=str(tmp / "model.npz"),
        checkpoint_dir=str(tmp / "ckpt_none"),  # no checkpoint -> fresh init
        img_size=64,
        batch_size=2,
        encoder_dtype="float32",
    )
    # shallow encoder for CPU test speed
    from human_pose_estimation_tpu.models.hmr import HMR
    import jax.numpy as jnp

    p = Predictor.__new__(Predictor)
    p.config = cfg
    p.batch_size = 2
    p.smpl = tiny
    p.hmr = HMR(tiny, num_stage=3, joint_type="lsp",
                encoder_stage_sizes=(1, 1, 1, 1))
    variables = p.hmr.init(jax.random.PRNGKey(0), img_size=64)
    p.variables = variables
    from human_pose_estimation_tpu.utils.assets import synthetic_mean_params

    p.mean_theta = jnp.asarray(synthetic_mean_params()[None, :])
    p._predict = jax.jit(p._predict_impl)
    return p


def test_predict_batch_and_padding(predictor, rng):
    imgs = rng.rand(3, 64, 64, 3).astype(np.float32) * 2 - 1  # 3 > batch 2
    out = predictor.predict(imgs)
    assert out["generated_verts"].shape == (3, 120, 3)
    assert out["generated_cams"].shape == (3, 3)
    assert out["generated_joints"].shape == (3, 14, 3)
    assert np.isfinite(out["generated_verts"]).all()

    # single-image API (ref predict_single_image)
    v, c, j = predictor.predict_single_image(imgs[0])
    np.testing.assert_allclose(v[0], out["generated_verts"][0], atol=1e-5)


def test_predict_is_deterministic(predictor, rng):
    imgs = rng.rand(2, 64, 64, 3).astype(np.float32)
    a = predictor.predict(imgs)["generated_verts"]
    b = predictor.predict(imgs)["generated_verts"]
    np.testing.assert_array_equal(a, b)


def test_rasterizer_basic():
    # one big triangle in front of the camera must cover pixels
    verts = np.array(
        [[-1.0, -1.0, 3.0], [1.0, -1.0, 3.0], [0.0, 1.5, 3.0]], np.float64
    )
    faces = np.array([[0, 1, 2]])
    r = viz.SMPLRenderer(img_size=64, faces=faces)
    img = r(verts, cam=[100.0, 32.0, 32.0])
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    # mesh color differs from white background somewhere near center
    assert (img[20:44, 20:44] != 255).any()

    # occlusion: nearer triangle wins
    verts2 = np.vstack([verts, verts * np.array([0.5, 0.5, 0.5])])
    faces2 = np.array([[0, 1, 2], [3, 4, 5]])
    r2 = viz.SMPLRenderer(img_size=64, faces=faces2)
    img2 = r2(verts2, cam=[100.0, 32.0, 32.0], do_alpha=True)
    assert img2.shape == (64, 64, 4)
    assert img2[..., 3].any()

    rot = r.rotated(verts, 45, cam=[100.0, 32.0, 32.0])
    assert rot.shape == (64, 64, 3)


def test_draw_skeleton_and_text(rng):
    img = rng.rand(64, 64, 3).astype(np.float32)
    joints = rng.rand(19, 2) * 64
    out = viz.draw_skeleton(img, joints)
    assert out.shape == img.shape and out.dtype == np.float32
    out14 = viz.draw_skeleton(img, joints[:14], vis=np.ones(14))
    assert out14.shape == img.shape
    txt = viz.draw_text(img, {"sc": 0.9, "kpl": 1.23})
    assert txt.shape == img.shape


def test_get_original_roundtrip():
    proc = {"scale": 0.5, "start_pt": np.array([10.0, 20.0]), "img_size": 224}
    verts = np.zeros((5, 3))
    cam = np.array([0.9, 0.1, -0.2])
    joints = np.ones((14, 2)) * 112
    cam_r, v_shift, kp = viz.get_original(proc, verts, cam, joints)
    assert cam_r.shape == (3,)
    assert v_shift.shape == (5, 3)
    # vertex z-shift equals flength / (0.5 * img_size * cam_s)
    np.testing.assert_allclose(v_shift[0, 2], 500.0 / (0.5 * 224 * 0.9))
    np.testing.assert_allclose(kp, (joints + proc["start_pt"] - 112) * 2.0)


def test_preprocess_for_inference(rng):
    img = (rng.rand(100, 80, 3) * 255).astype(np.uint8)
    norm, proc, orig = preprocess_for_inference(img, img_size=64)
    assert norm.shape == (64, 64, 3)
    assert -1.0 <= norm.min() and norm.max() <= 1.0
    assert proc["img_size"] == 64


def test_dataset_visualizers(tmp_path, tiny_model, rng):
    from human_pose_estimation_tpu.train.step import GenBatch
    from human_pose_estimation_tpu.viz.datasets import (
        draw_smpl_meshes,
        show_image_batch,
    )
    import jax.numpy as jnp

    batch = GenBatch(
        images=jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1),
        seg_points=jnp.asarray(rng.rand(2, 16, 2) * 32),
        seg_mask=jnp.ones((2, 16)),
        kp2d=jnp.asarray(rng.rand(2, 19, 3)),
    )
    p1 = show_image_batch(batch, out_path=str(tmp_path / "b.png"))
    assert os.path.exists(p1)
    p2 = draw_smpl_meshes(
        tiny_model,
        rng.randn(1, 72).astype(np.float32) * 0.1,
        rng.randn(1, 10).astype(np.float32) * 0.1,
        angles=(0.0, 90.0),
        img_size=48,
        out_path=str(tmp_path / "m.png"),
    )
    assert os.path.exists(p2)


def test_predict_uint8_matches_float(predictor, rng):
    """uint8 serving path: device-side normalize == host normalize."""
    raw = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    floats = raw.astype(np.float32) / 127.5 - 1.0
    a = predictor.predict(raw)["generated_verts"]
    b = predictor.predict(floats)["generated_verts"]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_predict_data_parallel_matches(predictor, rng, tmp_path_factory, request):
    """DP serving (8-device CPU mesh) == single-device results."""
    import jax
    from human_pose_estimation_tpu.models.hmr import HMR
    from human_pose_estimation_tpu.infer.predictor import Predictor
    from human_pose_estimation_tpu.utils.assets import synthetic_mean_params
    import jax.numpy as jnp

    tiny = request.getfixturevalue("tiny_model")
    p = Predictor.__new__(Predictor)
    p.config = predictor.config
    p.batch_size = 8
    p.smpl = tiny
    p.hmr = predictor.hmr
    p.variables = predictor.variables
    p.mean_theta = predictor.mean_theta
    from human_pose_estimation_tpu.parallel import mesh as pmesh

    p.mesh = pmesh.make_mesh(batch_size=8)
    p._predict = jax.jit(p._predict_impl)

    imgs = rng.rand(8, 64, 64, 3).astype(np.float32) * 2 - 1
    a = p.predict(imgs)["generated_verts"]
    b = predictor.predict(imgs)["generated_verts"]
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_batching_predictor_microbatching(predictor):
    """Serving microbatcher: concurrent submits coalesce into padded
    batches, results match direct Predictor calls, close() flushes."""
    import threading

    from human_pose_estimation_tpu.infer.serving import BatchingPredictor

    rng = np.random.RandomState(0)
    images = (rng.rand(5, 64, 64, 3) * 255).astype(np.uint8)
    direct = predictor.predict(images)

    bp = BatchingPredictor(predictor, max_latency_ms=30.0)
    futures = [None] * 5

    def submit(i):
        futures[i] = bp.submit(images[i])

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    results = [f.result(timeout=60) for f in futures]
    for i, res in enumerate(results):
        np.testing.assert_allclose(
            res["generated_verts"], direct["generated_verts"][i], atol=1e-5
        )
    assert bp.stats["requests"] == 5
    # batch_size=2 -> at least 3 device batches for 5 requests
    assert bp.stats["batches"] >= 3
    single = bp.predict_single_image(images[0])
    np.testing.assert_allclose(
        single["generated_verts"], direct["generated_verts"][0], atol=1e-5
    )
    bp.close()
    with pytest.raises(RuntimeError):
        bp.submit(images[0])


def test_batching_predictor_pipelined(predictor):
    """pipeline_depth > 1 keeps batches in flight but preserves exact
    results and FIFO future resolution; a predictor without the async
    API falls back to blocking fetches."""
    import threading

    from human_pose_estimation_tpu.infer.serving import BatchingPredictor

    rng = np.random.RandomState(1)
    images = (rng.rand(9, 64, 64, 3) * 255).astype(np.uint8)
    direct = predictor.predict(images)

    for depth in (1, 3):
        bp = BatchingPredictor(predictor, max_latency_ms=10.0, pipeline_depth=depth)
        futures = [None] * len(images)

        def submit(i):
            futures[i] = bp.submit(images[i])

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(len(images))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, f in enumerate(futures):
            np.testing.assert_allclose(
                f.result(timeout=60)["generated_verts"],
                direct["generated_verts"][i],
                atol=1e-5,
            )
        bp.close()
        assert bp.stats["requests"] == len(images)

    # Fallback: a predictor exposing only .predict (e.g. exported artifacts).
    class BlockingOnly:
        batch_size = predictor.batch_size

        def predict(self, imgs):
            return predictor.predict(imgs)

    bp = BatchingPredictor(BlockingOnly(), max_latency_ms=10.0, pipeline_depth=2)
    futs = [bp.submit(images[i]) for i in range(4)]
    for i, f in enumerate(futs):
        np.testing.assert_allclose(
            f.result(timeout=60)["generated_verts"],
            direct["generated_verts"][i],
            atol=1e-5,
        )
    bp.close()


def test_predict_async_fetch_matches(predictor, rng):
    """predict_async + predict_fetch == predict, including tail padding."""
    imgs = (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    want = predictor.predict(imgs)
    got = predictor.predict_fetch(predictor.predict_async(imgs))
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=0, err_msg=k)
    with pytest.raises(ValueError):
        predictor.predict_async(
            (rng.rand(predictor.batch_size + 1, 64, 64, 3) * 255).astype(np.uint8)
        )


def test_export_roundtrip(predictor, rng, tmp_path):
    """jax.export artifact: ExportedPredictor matches the live Predictor,
    including tail padding and multi-execution for n > batch."""
    from human_pose_estimation_tpu.infer.export import (
        ExportedPredictor,
        export_predictor,
    )

    path = str(tmp_path / "model.hlo")
    meta = export_predictor(predictor, path, platforms=("cpu",))
    assert meta["batch"] == predictor.batch_size
    assert os.path.exists(path) and os.path.exists(path + ".json")

    ep = ExportedPredictor(path)
    imgs = (rng.rand(5, 64, 64, 3) * 255).astype(np.uint8)  # 5 > batch 2
    got = ep.predict(imgs)
    want = predictor.predict(imgs)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5, err_msg=k)
    v, c, j = ep.predict_single_image(imgs[0])
    np.testing.assert_allclose(v[0], want["generated_verts"][0], atol=1e-5)


def test_export_roundtrip_int8(predictor, rng, tmp_path):
    """An int8-quantized predictor exports with the quantized weights
    baked in; the artifact matches the live int8 predictor exactly."""
    import jax

    from human_pose_estimation_tpu.infer.export import (
        ExportedPredictor,
        export_predictor,
    )

    calib = (rng.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
    predictor.encoder_qparams = predictor.hmr.quantize_encoder(
        predictor.variables, calibration_images=calib
    )
    try:
        path = str(tmp_path / "model_int8.hlo")
        meta = export_predictor(predictor, path, platforms=("cpu",))
        assert meta["encoder_int8"] is True

        ep = ExportedPredictor(path)
        imgs = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
        got = ep.predict(imgs)
        want = predictor.predict(imgs)
        for k in want:
            # Not bit-equal: the exported module compiles separately and
            # XLA may keep f32 in registers where the live program
            # materializes bf16 (convert-chain simplification), shifting
            # values at the quantization-noise scale.
            np.testing.assert_allclose(got[k], want[k], atol=5e-3, err_msg=k)
    finally:
        predictor.encoder_qparams = None  # shared fixture


def test_http_server_endpoints(predictor):
    """HTTP front-end: /predict (npz + JSON formats), /healthz, request
    microbatching through BatchingPredictor."""
    import io
    import json as jsonlib
    import threading
    import urllib.request

    cv2 = pytest.importorskip("cv2")
    from human_pose_estimation_tpu.infer.http_server import make_server
    from human_pose_estimation_tpu.infer.serving import BatchingPredictor

    bp = BatchingPredictor(predictor, max_latency_ms=20.0)
    httpd = make_server(bp, host="127.0.0.1", port=0, decode_size=64)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(0)
        img = (rng.rand(90, 70, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=enc.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            z = np.load(io.BytesIO(resp.read()))
            assert z["generated_verts"].shape == (120, 3)
            assert np.isfinite(z["generated_verts"]).all()

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=enc.tobytes(),
            method="POST",
            headers={"Accept": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = jsonlib.loads(resp.read())
            assert len(body["generated_cams"]) == 3
            assert len(body["generated_joints"]) == 14

        # ?format=raw -> uncompressed npz, byte-identical arrays
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?format=raw",
            data=enc.tobytes(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            zr = np.load(io.BytesIO(resp.read()))
            np.testing.assert_array_equal(
                zr["generated_verts"], z["generated_verts"]
            )

        # per-request outputs filter + json format via query param
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?format=json&outputs=generated_joints",
            data=enc.tobytes(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = jsonlib.loads(resp.read())
            assert set(body) == {"generated_joints"}

        # outputs filter applies to npz responses too
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?outputs=generated_cams,theta",
            data=enc.tobytes(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            zf = np.load(io.BytesIO(resp.read()))
            assert set(zf.files) == {"generated_cams", "theta"}

        # unknown format / unknown output key -> 400
        for bad in ("?format=msgpack", "?outputs=nope"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict{bad}",
                data=enc.tobytes(),
                method="POST",
            )
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, "expected HTTPError"
            except urllib.error.HTTPError as e:
                assert e.code == 400

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as resp:
            health = jsonlib.loads(resp.read())
            assert health["status"] == "ok" and health["requests"] >= 2

        # bad input -> 400 with error JSON
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not an image", method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        bp.close()


def test_predictor_outputs_filter(predictor, rng):
    """outputs=(...) restricts returned keys (serving bandwidth knob)."""
    import copy

    p = copy.copy(predictor)
    p.outputs = ("generated_joints", "generated_cams")
    import jax

    p._predict = jax.jit(p._predict_impl)
    imgs = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    out = p.predict(imgs)
    assert set(out) == {"generated_joints", "generated_cams"}
    full = predictor.predict(imgs)
    np.testing.assert_allclose(
        out["generated_joints"], full["generated_joints"], atol=1e-6
    )


def test_rasterizer_ssaa_antialiasing():
    """ssaa=2 supersampling (the OpenDR MSAA-8 role, ref renderer.py
    num_samples): same output size, softer edges — edge pixels take
    intermediate values between mesh color and background."""
    verts = np.array(
        [[-1.0, -1.0, 3.0], [1.0, -1.0, 3.0], [0.0, 1.5, 3.0]], np.float64
    )
    faces = np.array([[0, 1, 2]])
    r = viz.SMPLRenderer(img_size=64, faces=faces)
    hard = r(verts, cam=[100.0, 32.0, 32.0]).astype(int)
    soft = r(verts, cam=[100.0, 32.0, 32.0], ssaa=2).astype(int)
    assert soft.shape == hard.shape
    # interiors agree; edges gain intermediate (anti-aliased) values
    inner = np.abs(soft[28:36, 28:36] - hard[28:36, 28:36]).max()
    assert inner <= 2
    covered = (hard != 255).any(-1)
    mesh_vals = set(np.unique(hard[covered][:, 0]))
    edge_new = set(np.unique(soft[(soft != hard).any(-1)][:, 0])) - mesh_vals - {255}
    assert edge_new, "ssaa produced no intermediate edge values"
    # background override path with ssaa
    bg = np.zeros((64, 64, 3), np.float32)
    over = r(verts, cam=[100.0, 32.0, 32.0], img=bg, ssaa=2)
    assert over.shape == (64, 64, 3)
