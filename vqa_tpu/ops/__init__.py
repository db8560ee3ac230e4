"""Fused Pallas TPU kernels (SURVEY.md section 2.2).

The reference's native surface is ATen/cuDNN; ours is this kernel layer:
each op has a jnp reference implementation (the test oracle and CPU/autodiff
fallback) and a Pallas TPU kernel selected behind vqa_tpu.ops.flags.

  attention.glimpse_attend   softmax over regions + weighted sum, one pass
  mfb_pool.mfb_pool          sum-pool + signed-sqrt + L2 norm, one pass
  lstm.lstm_seq              full LSTM recurrence with VMEM-resident weights
                             and double-buffered HBM gate streaming
"""

from vqa_tpu.ops.flags import pallas_enabled, set_pallas  # noqa: F401
