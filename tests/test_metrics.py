"""CER: C++ kernel vs pure-Python DP vs hand-computed cases
(reference util.py:186-262, 2444-2475)."""

import numpy as np

from chinese_asr_tpu.ops import metrics
from chinese_asr_tpu.runtime import native


def test_edit_distance_cases():
    cases = [
        ("", "abc", 3),
        ("abc", "abc", 0),
        ("kitten", "sitting", 3),
        ("你好世界", "你好地球", 2),
        ("abc", "", 3),
    ]
    for pred, ref, d in cases:
        assert metrics._edit_distance_py(pred, ref) == d
        assert metrics.edit_distance(pred, ref) == d


def test_native_matches_python():
    lib = native.get()
    assert lib is not None, "C++ edit-distance kernel failed to build"
    rng = np.random.RandomState(0)
    alphabet = "abcdefg好世界你"
    for _ in range(50):
        a = "".join(rng.choice(list(alphabet), rng.randint(0, 15)))
        b = "".join(rng.choice(list(alphabet), rng.randint(1, 15)))
        assert lib.edit_distance(a, b) == metrics._edit_distance_py(a, b)


def test_cer_and_batch():
    assert metrics.cer("你好世界", "你好地球") == 0.5
    got = metrics.batch_cer(["你好世界", "abc"], ["你好地球", "abd"])
    ref = np.mean([0.5, 1.0 / 3.0])
    assert abs(got - ref) < 1e-9


def test_cer_detail():
    total, ins, dele, rep = metrics.cer_detail("kitten", "sitting", normalize=False)
    assert (total, ins + dele + rep) == (3, 3)
