"""UniAudio2-TPU: a TPU-native (JAX/XLA/Pallas) unified audio language model
framework with the capabilities of UniAudio 2.0 (yangdongchao/UniAudio2)."""

__version__ = "0.1.0"

from uniaudio2_tpu.utils.jax_compat import install_pjit_const_fastpath_guard

install_pjit_const_fastpath_guard()
del install_pjit_const_fastpath_guard
