"""Guard: tests run on the 8-virtual-device CPU mesh (SURVEY.md §4.2.4)."""

import jax


def test_eight_cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
