"""Driver hooks stay importable and traceable (no heavy execution)."""

import jax


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    # eval_shape traces the full program without running it
    out = jax.eval_shape(fn, *args)
    disp, pts = out
    assert disp.shape == (480, 640)
    assert pts.shape == (480, 640, 3)


def test_dryrun_signature():
    import inspect
    import __graft_entry__ as g

    sig = inspect.signature(g.dryrun_multichip)
    assert list(sig.parameters) == ["n_devices"]


def test_dryrun_multichip_executes_in_clean_env():
    """Run dryrun_multichip(8) in a subprocess with NO conftest env help.

    Round-1 shipped a bootstrap bug precisely because the in-process test
    only checked the signature: the driver invokes this hook in a fresh
    process where the axon sitecustomize pins the backend to the single
    real TPU. The hook itself must force the virtual CPU mesh.
    """
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout
