"""The five BASELINE.json evaluation configs, quick-sized (config 3 is also
covered in depth by test_mf_ber)."""

import pytest

from psk_soft_tpu.eval.baseline_configs import run_config


@pytest.mark.parametrize("n", [1, 2, 4, 5])
def test_baseline_config(n):
    result = run_config(n, quick=True)
    assert result["pass"], result
