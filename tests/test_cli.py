"""CLI end-to-end: render, snapshot, resume, invert, info."""

import os

import numpy as np

from simplepathtracer_tpu import io
from simplepathtracer_tpu.cli import main


def test_info_runs(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "cover" in out and "presets" in out


def test_render_simple_tiny(tmp_path):
    out = str(tmp_path / "img.png")
    rc = main([
        "render", "--preset", "simple", "-o", out,
        "--width", "32", "--height", "16", "--spp", "4", "--max-depth", "3",
        "--no-pallas", "-q",
    ])
    assert rc == 0 and os.path.exists(out)


def test_render_snapshot_resume(tmp_path):
    out1 = str(tmp_path / "a.bmp")
    out2 = str(tmp_path / "b.bmp")
    snap = str(tmp_path / "s.npz")
    common = [
        "--preset", "simple", "--width", "32", "--height", "16",
        "--max-depth", "3", "--no-pallas", "-q",
    ]
    # Full run in one go.
    assert main(["render", *common, "--spp", "8", "-o", out1]) == 0
    # Interrupted: 4 spp with snapshot, then resume to 8.
    assert main([
        "render", *common, "--spp", "4", "-o", str(tmp_path / "partial.bmp"),
        "--snapshot", snap, "--snapshot-every", "4",
    ]) == 0
    assert main([
        "render", "--preset", "simple", "--resume", snap, "--spp", "8",
        "-o", out2, "-q",
    ]) == 0
    a = io.read_bmp(out1)
    b = io.read_bmp(out2)
    np.testing.assert_array_equal(a, b)


def test_invert_smoke(tmp_path):
    rc = main([
        "invert", "--steps", "3", "--width", "24", "--height", "12",
        "--spp", "2", "-q", "-o", str(tmp_path / "rec.png"),
    ])
    assert rc == 0


def test_invert_preset_smoke(tmp_path):
    """Preset-scale invert mode: perturbed-albedo fit on a named preset
    with a before|target|after artifact (VERDICT r2 weak #6)."""
    out = str(tmp_path / "trip.png")
    rc = main([
        "invert", "--preset", "three_sphere", "--steps", "3",
        "--width", "32", "--height", "16", "--spp", "2", "--max-depth", "3",
        "-q", "-o", out,
    ])
    assert rc == 0
    import os

    assert os.path.exists(out)
