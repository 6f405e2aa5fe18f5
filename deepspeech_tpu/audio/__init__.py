from deepspeech_tpu.audio.features import (
    N_BINS,
    AudioConf,
    audio_to_stft_np,
    featurize_batch,
    make_window,
    normalize_spectrogram_batch,
    normalize_spectrogram_np,
    num_frames,
    parse_audio_np,
    stft_magnitude_np,
)
from deepspeech_tpu.audio.flac_encode import encode_flac, save_flac
from deepspeech_tpu.audio.io import (
    duration_seconds,
    load_audio,
    load_audio_norm,
    save_wav,
)

__all__ = [
    "N_BINS", "AudioConf", "audio_to_stft_np", "featurize_batch",
    "make_window", "normalize_spectrogram_batch", "normalize_spectrogram_np",
    "num_frames", "parse_audio_np", "stft_magnitude_np",
    "duration_seconds", "load_audio", "load_audio_norm", "save_wav",
    "encode_flac", "save_flac",
]
