"""Driver entry points must stay callable (compile check + multichip dryrun)."""

import jax


def test_entry_and_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert float(out[1]) < 10.0  # primres after one iteration is finite/sane
    g.dryrun_multichip(4)
