from deepspeech_tpu.ops.stft import frame_signal, stft_magnitude

__all__ = ["frame_signal", "stft_magnitude"]
