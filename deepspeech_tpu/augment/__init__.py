from deepspeech_tpu.augment.waveform import (
    AddNoise,
    AudioDistort,
    ChangeAudioSpeed,
    Compose,
    OneOf,
    OneOrOther,
    PitchShift,
    Shift,
    build_waveform_pipeline,
)
from deepspeech_tpu.augment.spectrogram import (
    FrequencyMask,
    SCompose,
    SComposePipelines,
    SOneOf,
    SOneOrOther,
    TimeMask,
    spec_augment,
)

__all__ = [
    "AddNoise", "AudioDistort", "ChangeAudioSpeed", "Compose", "OneOf",
    "OneOrOther", "PitchShift", "Shift", "build_waveform_pipeline",
    "FrequencyMask", "SCompose", "SComposePipelines", "SOneOf", "SOneOrOther",
    "TimeMask", "spec_augment",
]
