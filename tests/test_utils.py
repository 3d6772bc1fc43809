import numpy as np
import pytest

from cdlrm_tpu.utils.primes import is_prime, next_prime
from cdlrm_tpu.utils.metrics import StreamingAUC, accuracy_count, roc_auc


def test_is_prime_basics():
    primes = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37}
    for n in range(40):
        assert is_prime(n) == (n in primes), n


def test_is_prime_perfect_squares():
    # the reference's isPrime misclassifies perfect squares (while i*i < n,
    # model_no_ddp.py:325); ours must not
    assert not is_prime(9)
    assert not is_prime(25)
    assert not is_prime(49)
    assert not is_prime(121)


def test_next_prime():
    assert next_prime(1) == 2
    assert next_prime(10240) == 10243
    assert next_prime(150000) == 150001
    assert is_prime(next_prime(150001))
    assert next_prime(17) == 17


def test_accuracy_count():
    s = np.array([[0.6], [0.4], [0.51], [0.2]])
    t = np.array([[1.0], [0.0], [0.0], [0.0]])
    assert accuracy_count(s, t) == 3


def test_roc_auc_perfect_and_random():
    t = np.array([0, 0, 1, 1])
    assert roc_auc(np.array([0.1, 0.2, 0.8, 0.9]), t) == 1.0
    assert roc_auc(np.array([0.9, 0.8, 0.2, 0.1]), t) == 0.0
    # ties get midrank treatment
    assert roc_auc(np.array([0.5, 0.5, 0.5, 0.5]), t) == 0.5


def test_streaming_auc_matches_exact():
    rng = np.random.default_rng(0)
    scores = rng.random(5000)
    targets = (rng.random(5000) < scores).astype(np.float32)  # informative
    exact = roc_auc(scores, targets)
    stream = StreamingAUC(num_buckets=100_000)
    for i in range(0, 5000, 777):
        stream.update(scores[i : i + 777], targets[i : i + 777])
    assert abs(stream.result() - exact) < 1e-3


def test_streaming_auc_degenerate():
    s = StreamingAUC()
    s.update(np.array([0.5]), np.array([1.0]))
    assert np.isnan(s.result())
