"""compat.ensure_protobuf shim contract (ADVICE r3): descendant processes
must resolve a NATIVE google.protobuf ahead of the vendored runtime even
though PYTHONPATH precedes site-packages — the exported entry is the
_pbshim merge package, never the vendored dir itself."""

import os
import subprocess
import sys

import pytest

from minibatch_spark import compat

SHIM = os.path.join(os.path.dirname(compat.__file__), "_pbshim")


def _vendored_dir() -> str | None:
    for cand in compat._VENDORED_PROTOBUF_DIRS:
        if cand and os.path.isdir(os.path.join(cand, "google", "protobuf")):
            return cand
    return None


def _run(pythonpath: str, code: str) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = pythonpath
    env["MINIBATCH_SPARK_PROTOBUF_VENDORED"] = _vendored_dir() or ""
    env.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    return out.stdout.strip()


@pytest.mark.skipif(_vendored_dir() is None, reason="no vendored protobuf on disk")
def test_child_without_native_protobuf_gets_vendored():
    """A child with only the shim on PYTHONPATH falls back to the vendored
    runtime (the transformWithState worker case in this container)."""
    path = _run(
        SHIM,
        "import google.protobuf; print(google.protobuf.__file__)",
    )
    assert _vendored_dir() in path


@pytest.mark.skipif(_vendored_dir() is None, reason="no vendored protobuf on disk")
def test_child_with_native_protobuf_wins(tmp_path):
    """A child that HAS its own google.protobuf (simulated site-packages
    portion AFTER the shim on the path) resolves it — the vendored runtime
    is appended LAST by the shim, never first."""
    native = tmp_path / "native" / "google" / "protobuf"
    native.mkdir(parents=True)
    (native / "__init__.py").write_text("WHO = 'native'\n")
    path = _run(
        f"{SHIM}{os.pathsep}{tmp_path / 'native'}",
        "import google.protobuf; print(google.protobuf.__file__)",
    )
    assert str(tmp_path) in path


def test_ensure_protobuf_exports_shim_not_vendored_dir():
    """After ensure_protobuf() in a fresh child, PYTHONPATH carries the
    shim dir; the vendored dir itself must NOT be on PYTHONPATH (it would
    shadow a native protobuf in grandchildren)."""
    vend = _vendored_dir()
    if vend is None:
        pytest.skip("no vendored protobuf on disk")
    code = (
        "import os, sys\n"
        "sys.path.insert(0, os.environ['MB_REPO'])\n"
        "from minibatch_spark.compat import ensure_protobuf\n"
        "assert ensure_protobuf()\n"
        "print(os.environ.get('PYTHONPATH', ''))\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["MB_REPO"] = os.path.dirname(os.path.dirname(compat.__file__))
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    exported = out.stdout.strip().split(os.pathsep)
    has_native = subprocess.run(
        [sys.executable, "-c", "import google.protobuf"],
        env={**env, "PYTHONPATH": ""}, capture_output=True,
    ).returncode == 0
    if has_native:
        assert exported == [""]  # native protobuf: nothing exported
    else:
        assert SHIM in exported
        assert vend not in exported
