"""Shared helpers for the C++ PJRT runtime test modules.

One source of truth for the build-dependency probes, the mtime-checked
build wrapper over ``cpp/build.sh``, and the RSS reader — previously
re-implemented (with drift risk) in each ``test_pjrt_*_cpp.py`` module.
"""
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLUGIN = "/opt/axon/libaxon_pjrt.so"

have_opencv_dev = os.path.isdir("/usr/include/opencv4")


def have_header() -> bool:
    """The PJRT C API header ships inside the installed tensorflow pkg."""
    try:
        import tensorflow
        return os.path.exists(os.path.join(
            os.path.dirname(tensorflow.__file__), "include", "tensorflow",
            "compiler", "xla", "pjrt", "c", "pjrt_c_api.h"))
    except Exception:
        return False


def have_build_deps(opencv: bool = True) -> bool:
    return bool(shutil.which("g++")) and have_header() \
        and (have_opencv_dev or not opencv)


def have_plugin() -> bool:
    return os.path.exists(PLUGIN)


def build(target: str) -> str:
    """Build ``cpp/<target>`` iff stale vs its sources; return the binary
    path."""
    binary = os.path.join(REPO, "cpp", target)
    sources = [os.path.join(REPO, "cpp", f"{target}.cc"),
               os.path.join(REPO, "cpp", "pjrt_common.h")]
    if (not os.path.exists(binary)
            or any(os.path.getmtime(binary) < os.path.getmtime(s)
                   for s in sources)):
        subprocess.run(
            ["bash", os.path.join(REPO, "cpp", "build.sh"), target],
            check=True, capture_output=True, text=True)
    return binary


def rss_mb(pid: int) -> float:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0
