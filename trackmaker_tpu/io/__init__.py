from trackmaker_tpu.io.wav import read_wav, write_wav
from trackmaker_tpu.io.dump import AudioData, dump_to_json, dump_to_wav, load_json
from trackmaker_tpu.io.codec import decode_flac_to_f32, load_audio

__all__ = ["read_wav", "write_wav", "AudioData", "dump_to_json",
           "dump_to_wav", "load_json", "decode_flac_to_f32", "load_audio"]
