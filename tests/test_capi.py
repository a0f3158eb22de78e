"""C ABI integration: build libkmtpu.so + the C smoke binary with CMake and
run it against the CPU backend (the embedded-interpreter path end to end)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("cmake") is None or
                    shutil.which("ninja") is None,
                    reason="cmake/ninja not available")
def test_c_abi_smoke(tmp_path_factory):
    build = str(tmp_path_factory.mktemp("kmtpu_native"))
    subprocess.run(
        ["cmake", "-S", os.path.join(REPO, "native"), "-B", build,
         "-G", "Ninja"],
        check=True, capture_output=True)
    subprocess.run(["cmake", "--build", build], check=True,
                   capture_output=True)
    env = dict(os.environ)
    env["KMTPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [os.path.join(build, "kmtpu_smoke")], env=env, timeout=600,
        capture_output=True, text=True)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "KMTPU_SMOKE_OK" in out.stdout
    # device-handle protocol (kmtpu_upload/kmeans_device/knn_device/fetch)
    assert "KMTPU_DEVICE_PIPELINE_OK" in out.stdout
    # the reference logs this progress metric (knn.cu:521-530)
    assert "calculated " in out.stdout
