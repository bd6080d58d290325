"""Driver-gate regression: ``dryrun_multichip`` must force the CPU platform
itself.

Round 1's official multi-chip gate failed because the driver imports
``__graft_entry__`` and calls ``dryrun_multichip(8)`` directly in a process
whose environment pins JAX to the real axon TPU — the ``__main__`` guard never
ran, the dryrun landed on the one real chip, and died on a libtpu mismatch.
These tests reproduce the driver's calling convention in a child process.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_child(code: str, *, env_overrides: dict, timeout: int = 420):
    env = dict(os.environ)
    # no axon site hook (its tunnel handshake can block for minutes under
    # contention), but otherwise a hostile environment: JAX_PLATFORMS points
    # away from cpu and XLA_FLAGS carries no virtual-device count.
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


def test_dryrun_multichip_forces_cpu_like_the_driver():
    # The driver's exact convention: import the module, call the function.
    # JAX_PLATFORMS deliberately names a non-cpu platform.
    out = _run_child(
        """
        import __graft_entry__ as g
        g.dryrun_multichip(8)
        import jax
        assert jax.devices()[0].platform == "cpu", jax.devices()
        print("GATE_OK", len(jax.devices()))
        """,
        env_overrides={"JAX_PLATFORMS": "tpu"},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "GATE_OK 8" in out.stdout


def test_dryrun_multichip_fails_loudly_when_backend_already_small():
    # If a CPU backend is already live with fewer devices than requested, the
    # function must raise instead of silently running an undersized mesh.
    out = _run_child(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        n = len(jax.devices())  # initializes the backend (1 device: no flag)
        assert n < 8, n
        import __graft_entry__ as g
        try:
            g.dryrun_multichip(8)
        except RuntimeError as e:
            print("RAISED", str(e)[:80])
        else:
            raise SystemExit("dryrun_multichip did not raise")
        """,
        env_overrides={"JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "RAISED" in out.stdout
