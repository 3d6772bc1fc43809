from cdlrm_tpu.utils.primes import is_prime, next_prime
from cdlrm_tpu.utils.metrics import accuracy_count, roc_auc, StreamingAUC

__all__ = ["is_prime", "next_prime", "accuracy_count", "roc_auc", "StreamingAUC"]
