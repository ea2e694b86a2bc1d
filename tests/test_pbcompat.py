"""Shim-dir trust hardening for the protobuf compat layer.

The shim directory name under /tmp is predictable (per-uid), so a hostile
local user could pre-create it and re-point the google/protobuf symlink at
code that lands on every forked Spark worker's sys.path. ensure_protobuf
must refuse a shim dir that is not owned by us or is group/other-writable.
"""

import os
import subprocess
import sys

import pytest

from core_spark.streaming import pbcompat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dir_trusted_rejects_world_writable(tmp_path):
    d = tmp_path / "shim"
    d.mkdir(mode=0o700)
    assert pbcompat._dir_trusted(str(d))
    os.chmod(d, 0o707)  # other-writable -> attacker could swap the symlink
    assert not pbcompat._dir_trusted(str(d))
    os.chmod(d, 0o720)  # group-writable -> same
    assert not pbcompat._dir_trusted(str(d))
    os.chmod(d, 0o755)  # readable by others but only we write -> fine
    assert pbcompat._dir_trusted(str(d))


def test_dir_trusted_rejects_missing_and_symlink(tmp_path):
    assert not pbcompat._dir_trusted(str(tmp_path / "absent"))
    real = tmp_path / "real"
    real.mkdir(mode=0o700)
    link = tmp_path / "link"
    link.symlink_to(real)
    # lstat: a symlinked dir is refused even if its target looks fine
    assert not pbcompat._dir_trusted(str(link))


def _run_shim_subprocess(tmp_path):
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from core_spark.streaming.pbcompat import ensure_protobuf\n"
        "print(ensure_protobuf())\n" % REPO
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["TMPDIR"] = str(tmp_path)  # shim root -> our planted dir's parent
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    assert out.returncode == 0, out.stderr
    return out.stdout.strip()


def _needs_shim():
    return pbcompat._import_ok() and "core_spark_pbshim" not in (
        getattr(__import__("google.protobuf", fromlist=["_"]), "__file__", "") or ""
    )


def test_ensure_protobuf_heals_empty_loose_dir_we_own(tmp_path):
    """An EMPTY world-writable shim dir owned by us (e.g. created by an
    older build under a permissive umask) is healed: chmod'd to 0700 and
    used. Runs in a subprocess so the check happens before google.protobuf
    is importable natively."""
    if _needs_shim():
        pytest.skip("native protobuf install present; shim path never taken")
    shim = tmp_path / f"core_spark_pbshim_{os.getuid()}"
    shim.mkdir(mode=0o777)
    os.chmod(shim, 0o777)  # defeat umask
    assert _run_shim_subprocess(tmp_path) == "True"
    assert (os.stat(shim).st_mode & 0o777) == 0o700  # healed, not adopted


def test_ensure_protobuf_refuses_planted_content(tmp_path):
    """A shim dir carrying anything beyond the expected google/protobuf
    tree (e.g. a planted google/__init__.py that would execute from
    sys.path in every forked worker) is refused outright — chmod can't
    undo files written while the dir was loose."""
    if _needs_shim():
        pytest.skip("native protobuf install present; shim path never taken")
    shim = tmp_path / f"core_spark_pbshim_{os.getuid()}"
    (shim / "google").mkdir(parents=True)
    (shim / "google" / "__init__.py").write_text("PLANTED = 1\n")
    assert _run_shim_subprocess(tmp_path) == "False"
    # same for an unexpected entry at the shim root
    import shutil

    shutil.rmtree(shim)
    (shim / "google").mkdir(parents=True)
    (shim / "evil.pth").write_text("x\n")
    assert _run_shim_subprocess(tmp_path) == "False"
