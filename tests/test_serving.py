"""Serving daemon + C client tests: session lifecycle, frame push / pose
pull through the actual C library (loaded via ctypes, exercising the real
C ABI the way a host app would), protocol error handling."""

import ctypes
import os
import subprocess
import threading

import numpy as np
import pytest

from openekfmonoslam_tpu.config import SlamConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "lib", "libekfclient.so")


def make_frames(rng, n, h=480, w=640):
    import jax.numpy as jnp
    from openekfmonoslam_tpu.vision import brief
    big = np.kron(rng.integers(0, 255, ((h + 40) // 4, (w + 60) // 4)),
                  np.ones((4, 4))).astype(np.float32)
    big = np.asarray(brief.smooth(jnp.asarray(big), 1.0))
    return [np.clip(big[10:10 + h, 10 + i:10 + i + w], 0, 255
                    ).astype(np.uint8) for i in range(n)]


class EkfPose(ctypes.Structure):
    _fields_ = [("r", ctypes.c_double * 3), ("q", ctypes.c_double * 4),
                ("v", ctypes.c_double * 3), ("matches", ctypes.c_uint32),
                ("li_inliers", ctypes.c_uint32),
                ("hi_inliers", ctypes.c_uint32),
                ("map_size", ctypes.c_uint32)]


@pytest.fixture(scope="module")
def clib():
    if not os.path.exists(LIB):
        subprocess.run(["sh", os.path.join(REPO, "tools",
                                           "build_native.sh")], check=True)
    lib = ctypes.CDLL(LIB)
    lib.ekf_connect.restype = ctypes.c_void_p
    lib.ekf_connect.argtypes = [ctypes.c_char_p]
    lib.ekf_create.restype = ctypes.c_int64
    lib.ekf_create.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ekf_init.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                             ctypes.c_char_p, ctypes.c_uint32,
                             ctypes.c_uint32]
    lib.ekf_step.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                             ctypes.c_char_p, ctypes.c_uint32,
                             ctypes.c_uint32, ctypes.POINTER(EkfPose)]
    lib.ekf_state.restype = ctypes.c_int64
    lib.ekf_state.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.c_size_t]
    lib.ekf_release.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.ekf_last_error.restype = ctypes.c_char_p
    lib.ekf_last_error.argtypes = [ctypes.c_void_p]
    lib.ekf_disconnect.argtypes = [ctypes.c_void_p]
    return lib


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from openekfmonoslam_tpu.serving.server import SlamServer

    sock = str(tmp_path_factory.mktemp("srv") / "ekf.sock")
    cfg = SlamConfig(max_features=12, max_keypoints=64, max_hypotheses=12)
    srv = SlamServer.__new__(SlamServer)
    SlamServer.__init__(srv, config_path="")
    # sessions use an in-memory config (bypass YML loading)
    srv.engine_kwargs = {}
    orig_create = srv.create

    def create_with_cfg(payload):
        from openekfmonoslam_tpu.engine.engine import SlamEngine
        engine = SlamEngine(cfg)
        with srv._lock:
            sid = srv._next_id
            srv._next_id += 1
            srv.sessions[sid] = engine
        import struct
        return struct.pack("<I", sid)

    srv.create = create_with_cfg
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock, ready), daemon=True)
    t.start()
    assert ready.wait(10)
    yield sock, srv
    srv.shutdown()


class TestCClientEndToEnd:
    def test_session_lifecycle_and_tracking(self, clib, server, rng):
        sock, _ = server
        c = clib.ekf_connect(sock.encode())
        assert c
        sid = clib.ekf_create(c, b"")
        assert sid > 0
        frames = make_frames(rng, 5)
        h, w = frames[0].shape
        assert clib.ekf_init(c, sid, frames[0].tobytes(), h, w) == 0

        pose = EkfPose()
        for f in frames[1:]:
            rc = clib.ekf_step(c, sid, f.tobytes(), h, w,
                               ctypes.byref(pose))
            assert rc == 0, clib.ekf_last_error(c)
            assert np.isfinite(list(pose.r)).all()
        assert pose.map_size > 0
        assert pose.matches > 0
        # quaternion stays normalized
        assert abs(sum(x * x for x in pose.q) - 1.0) < 1e-6

        # full state fetch
        buf = (ctypes.c_double * 4096)()
        n = clib.ekf_state(c, sid, buf, 4096)
        assert n > 13
        assert np.isfinite(buf[:13]).all()

        assert clib.ekf_release(c, sid) == 0
        clib.ekf_disconnect(c)

    def test_two_sessions_independent(self, clib, server, rng):
        sock, _ = server
        c = clib.ekf_connect(sock.encode())
        s1 = clib.ekf_create(c, b"")
        s2 = clib.ekf_create(c, b"")
        assert s1 != s2
        frames = make_frames(rng, 3)
        h, w = frames[0].shape
        assert clib.ekf_init(c, s1, frames[0].tobytes(), h, w) == 0
        assert clib.ekf_init(c, s2, frames[2].tobytes(), h, w) == 0
        pose1, pose2 = EkfPose(), EkfPose()
        clib.ekf_step(c, s1, frames[1].tobytes(), h, w,
                      ctypes.byref(pose1))
        clib.ekf_step(c, s2, frames[1].tobytes(), h, w,
                      ctypes.byref(pose2))
        # session 2 initialized on a shifted frame -> different motion
        assert list(pose1.r) != list(pose2.r)
        clib.ekf_release(c, s1)
        clib.ekf_release(c, s2)
        clib.ekf_disconnect(c)

    def test_errors_are_reported_not_fatal(self, clib, server, rng):
        sock, _ = server
        c = clib.ekf_connect(sock.encode())
        pose = EkfPose()
        # step on a nonexistent session -> remote error, connection lives
        rc = clib.ekf_step(c, 9999, b"\0" * 16, 4, 4, ctypes.byref(pose))
        assert rc == -3
        assert b"9999" in clib.ekf_last_error(c)
        # wrong frame size -> remote error
        sid = clib.ekf_create(c, b"")
        rc = clib.ekf_init(c, sid, b"\0" * 16, 4, 4)
        assert rc == -3
        assert b"frame payload" in clib.ekf_last_error(c)
        # connection still usable afterwards
        frames = make_frames(rng, 1)
        h, w = frames[0].shape
        assert clib.ekf_init(c, sid, frames[0].tobytes(), h, w) == 0
        clib.ekf_release(c, sid)
        clib.ekf_disconnect(c)
