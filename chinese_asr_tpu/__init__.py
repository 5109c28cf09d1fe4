"""chinese_asr_tpu: a TPU-native (JAX/XLA/Pallas/pjit) Mandarin LAS speech
recognizer with the full capability surface of shawnthu/chinese-asr.

Public API (the reference's __init__.py imports symbols that don't exist,
reference __init__.py:1 — this one works):

    from chinese_asr_tpu import ASR, Config, Vocab
    asr = ASR(ckpt_path=..., lm_path=..., bw=16, vocab="dict.pkl")
    text = asr("utterance.wav")
"""

from .config import Config, DEFAULT_CONFIG
from .vocab import Vocab

__version__ = "0.1.0"
__all__ = ["ASR", "Config", "DEFAULT_CONFIG", "Vocab", "__version__"]


def __getattr__(name):
    # lazy: importing the package must not pull in jax/device state
    if name == "ASR":
        from .api import ASR as _ASR
        return _ASR
    raise AttributeError(name)
