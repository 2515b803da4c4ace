"""CLI (__main__) and distributed-helper coverage."""

import json
import os

import jax


def test_cli_acopf_json(case9_path, tmp_path, capsys):
    from exaadmm_tpu.__main__ import main

    ckpt = str(tmp_path / "sol.npz")
    rc = main([case9_path, "--verbose", "0", "--json",
               "--outer-iterlim", "25", "--outer-eps", "2e-5",
               "--checkpoint", ckpt])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert rc == 0
    assert summary["status"] == "Solved"
    assert 5296.0 <= summary["objval"] <= 5304.5
    assert os.path.exists(ckpt)


def test_cli_pf(case9_path, capsys):
    from exaadmm_tpu.__main__ import main

    rc = main([case9_path, "--solver", "pf", "--verbose", "0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["converged"]


def test_distributed_single_process_mesh(case9_path):
    # single-process: initialize() is a no-op, mesh covers local devices,
    # and the rank window spans the whole padded line batch
    from exaadmm_tpu.parallel import distributed

    mesh = distributed.initialize_and_make_mesh()
    assert mesh.devices.size == len(jax.devices())
    sl = distributed.process_line_slice(mesh.devices.size * 3)
    assert sl == slice(0, mesh.devices.size * 3)
