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
