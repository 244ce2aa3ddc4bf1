"""Native C++ rasterizer + MJPEG AVI writer tests (no GL stack needed)."""

import io
import struct

import mujoco
import numpy as np
import pytest

from brax_tracking_tpu.harness.render import make_renderer
from brax_tracking_tpu.native.softraster import NativeRenderer
from brax_tracking_tpu.native.video import save_video, write_mjpeg_avi

_SCENE = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1" rgba="0.5 0.5 0.5 1"/>
    <body pos="0 0 0.5">
      <geom name="ball" type="sphere" size="0.25" rgba="1 0 0 1"/>
    </body>
    <camera name="cam" pos="1.5 0 0.6" xyaxes="0 1 0 0 0 1"/>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def scene():
    m = mujoco.MjModel.from_xml_string(_SCENE)
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    return m, d


def test_renderer_draws_sphere_over_floor(scene):
    m, d = scene
    r = NativeRenderer(m, height=120, width=160)
    r.update_scene(d, camera=0)
    img = r.render()
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    # center of frame: red sphere (camera looks straight at it)
    c = img[60, 80].astype(int)
    assert c[0] > 2 * max(c[1], 1), f"expected red sphere at center, got {c}"
    # bottom rows: gray floor, not background
    f = img[115, 80].astype(int)
    assert abs(f[0] - f[1]) < 12 and abs(f[1] - f[2]) < 12, f"expected gray floor, got {f}"
    # sphere must occlude the floor: some red region strictly inside frame
    red = (img[:, :, 0].astype(int) - img[:, :, 1]) > 60
    assert red.sum() > 50


def test_renderer_camera_moves_scene(scene):
    m, d = scene
    r = NativeRenderer(m, height=96, width=128)
    r.update_scene(d, camera=0)
    a = r.render()
    r.update_scene(d, camera=-1)  # default orbit camera differs
    b = r.render()
    assert (a != b).any()


def test_make_renderer_falls_back_to_native(scene):
    m, _ = scene
    r = make_renderer(m, height=64, width=64)
    # no GL in this image -> native backend
    assert isinstance(r, NativeRenderer)


def test_mjpeg_avi_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    frames = [
        np.full((32, 48, 3), [i * 40, 100, 200], np.uint8) for i in range(4)
    ]
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, frames, fps=25)
    raw = open(path, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    assert struct.unpack("<I", raw[4:8])[0] == len(raw) - 8
    # decode first JPEG chunk and compare (JPEG is lossy; solid colors are close)
    i = raw.find(b"00dc")
    size = struct.unpack("<I", raw[i + 4 : i + 8])[0]
    jpg = raw[i + 8 : i + 8 + size]
    from PIL import Image

    dec = np.asarray(Image.open(io.BytesIO(jpg)))
    assert dec.shape == (32, 48, 3)
    assert np.abs(dec.astype(int) - frames[0].astype(int)).mean() < 8
    # 4 movi chunks + 4 idx1 entries
    assert raw.count(b"00dc") == 2 * len(frames)


def test_save_video_falls_back_without_ffmpeg(tmp_path):
    frames = [np.zeros((16, 16, 3), np.uint8)] * 3
    out = save_video(str(tmp_path / "v.mp4"), frames, fps=10)
    assert out.endswith((".mp4", ".avi"))
    import os

    assert os.path.getsize(out) > 100


def test_gif_fallback_roundtrip(tmp_path):
    """First-party GIF89a writer: frames on the 6-level color cube decode
    back exactly (palette hit), others within one quantization step."""
    from brax_tracking_tpu.native.video import write_gif

    frames = []
    for t in range(4):
        f = np.zeros((24, 40, 3), np.uint8)
        f[:, :, 0] = 51 * t
        f[5:15, 10:30, 1] = 204
        frames.append(f)
    path = write_gif(str(tmp_path / "clip.gif"), frames, fps=20)
    from PIL import Image

    im = Image.open(path)
    assert im.format == "GIF" and im.n_frames == len(frames)
    for t in range(im.n_frames):
        im.seek(t)
        dec = np.asarray(im.convert("RGB"))
        assert np.array_equal(dec, frames[t])
