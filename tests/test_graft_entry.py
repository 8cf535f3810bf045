"""Driver entry-point contract: the multi-chip dryrun must be hermetic.

Round-1 regression (VERDICT.md §weak-1): under the ambient TPU platform the
dryrun's un-pinned init arrays dispatched to the real chip and died on a
libtpu client/terminal version skew. The dryrun must validate the SPMD
training step on a virtual CPU mesh and NEVER touch the default backend.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_impl_runs_on_cpu_mesh(capsys):
    """In-process body: 8 virtual CPU devices (conftest XLA_FLAGS)."""
    graft._dryrun_multichip_impl(8)
    out = capsys.readouterr().out
    assert "ok" in out and "on cpu" in out


def test_dryrun_subprocess_is_hermetic():
    """The public entry re-execs a child that forces the CPU platform even
    when the parent environment points at a (possibly broken) TPU plugin."""
    env_backup = {k: os.environ.get(k)
                  for k in ("JAX_PLATFORMS", "PYTHONPATH", "XLA_FLAGS")}
    try:
        # simulate the driver's ambient environment: TPU plugin on the path,
        # platform unpinned, no virtual-device flag
        os.environ["JAX_PLATFORMS"] = "axon"
        os.environ["PYTHONPATH"] = "/root/.axon_site"
        os.environ.pop("XLA_FLAGS", None)
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            graft.dryrun_multichip(4)
        out = buf.getvalue()
        assert "dryrun_multichip(4): ok" in out
        assert "on cpu" in out
    finally:
        for k, v in env_backup.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_dryrun_impl_requires_enough_devices():
    with pytest.raises(RuntimeError, match="CPU devices"):
        graft._dryrun_multichip_impl(512)
