from deepspeech_tpu.utils.logging import MetricsLogger, Observer, ObserverList
from deepspeech_tpu.utils.meters import AverageMeter, StopWatch

__all__ = ["MetricsLogger", "Observer", "ObserverList", "AverageMeter",
           "StopWatch"]
