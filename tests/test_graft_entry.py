"""Driver-contract tests for ``__graft_entry__.dryrun_multichip``.

Round-1 verdict item 1: the driver calls ``dryrun_multichip(8)`` in a
process whose JAX backend is the single real TPU chip; the function must
bootstrap its own 8-virtual-CPU-device backend (subprocess re-exec with
``XLA_FLAGS=--xla_force_host_platform_device_count``) rather than rely on
the caller's environment.
"""

import jax

import __graft_entry__ as ge


def test_dryrun_in_process_when_enough_devices(capsys):
    # conftest gives this process 8 virtual CPU devices -> in-process path.
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "mesh data=4 x model=2" in out and "OK" in out


def test_dryrun_subprocess_bootstraps_devices(capsys):
    # Force the subprocess branch regardless of this process's device count:
    # this is exactly what the driver hits on the 1-chip TPU backend.
    ge._dryrun_in_subprocess(8)
    out = capsys.readouterr().out
    assert "mesh data=4 x model=2" in out and "OK" in out
