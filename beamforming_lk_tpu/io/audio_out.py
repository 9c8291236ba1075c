"""Live audio playback + MP3 recording of the MISO beam (optional).

The reference plays the beam through PortAudio callbacks and simultaneously
records ``output.wav`` AND ``output.mp3``
(``src/audio/audio_wrapper.cpp:12-85,93-143``).  A compute framework
shouldn't hard-depend on a sound stack, so playback here is a thin pipe to
``aplay`` (ALSA) — or any compatible PCM-on-stdin player — and MP3 encoding
pipes to ``lame``/``ffmpeg`` when present, both degrading gracefully when
the binary/sound device is missing (the WAV recorder in io/wav.py is the
always-available sink).
"""

from __future__ import annotations

import shutil
import subprocess
from typing import Optional, Sequence

import numpy as np


def default_player_command(sample_rate: float) -> Optional[Sequence[str]]:
    """The aplay invocation for mono float->s16le blocks, or None if no
    player binary is available."""
    if shutil.which("aplay") is None:
        return None
    return [
        "aplay", "-q", "-f", "S16_LE", "-r", str(int(round(sample_rate))),
        "-c", "1", "-t", "raw", "-",
    ]


class AudioPlayer:
    """Streams float blocks to a PCM player subprocess.

    ``command`` overrides the player (tests pipe to a file reader); raises
    RuntimeError when no player is available and none is given.
    """

    def __init__(
        self,
        sample_rate: float = 48828.0,
        command: Optional[Sequence[str]] = None,
    ):
        if command is None:
            command = default_player_command(sample_rate)
        if command is None:
            raise RuntimeError(
                "no audio player available (aplay not found); "
                "record with io.wav.WavWriter instead"
            )
        self._proc = subprocess.Popen(
            list(command), stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    def play(self, block) -> None:
        """Queue one float block [T] in [-1, 1]."""
        data = np.clip(np.asarray(block, np.float32), -1.0, 1.0)
        pcm = np.round(data * 32767.0).astype("<i2").tobytes()
        try:
            self._proc.stdin.write(pcm)
            self._proc.stdin.flush()
        except BrokenPipeError as e:
            raise RuntimeError("audio player exited") from e

    def close(self) -> None:
        if self._proc.stdin:
            try:
                self._proc.stdin.close()
            except BrokenPipeError:
                pass
        self._proc.wait(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def default_encoder_command(path: str, sample_rate: float) -> Optional[Sequence[str]]:
    """An MP3 encoder reading s16le PCM on stdin (``lame`` preferred, the
    reference's encoder, audio_wrapper.cpp:46-63; ``ffmpeg`` fallback), or
    None when neither binary exists."""
    rate = int(round(sample_rate))
    if shutil.which("lame") is not None:
        return ["lame", "-r", "-s", str(rate), "-m", "m", "--signed",
                "--bitwidth", "16", "--little-endian", "-", path]
    if shutil.which("ffmpeg") is not None:
        return ["ffmpeg", "-loglevel", "quiet", "-y", "-f", "s16le",
                "-ar", str(rate), "-ac", "1", "-i", "-", path]
    return None


class Mp3Recorder:
    """Streams float blocks to an MP3 encoder subprocess
    (audio_wrapper.cpp:12-85 records output.mp3 alongside output.wav).

    ``command`` overrides the encoder (tests substitute a PCM sink); raises
    RuntimeError when no encoder is available and none is given — callers
    degrade to WAV-only.
    """

    def __init__(
        self,
        path: str,
        sample_rate: float = 48828.0,
        command: Optional[Sequence[str]] = None,
    ):
        if command is None:
            command = default_encoder_command(path, sample_rate)
        if command is None:
            raise RuntimeError(
                "no MP3 encoder available (lame/ffmpeg not found); "
                "record with io.wav.WavWriter instead"
            )
        self.path = path
        self._proc = subprocess.Popen(
            list(command), stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    def write(self, block) -> None:
        """Append one float block [T] in [-1, 1]."""
        data = np.clip(np.asarray(block, np.float32), -1.0, 1.0)
        pcm = np.round(data * 32767.0).astype("<i2").tobytes()
        try:
            self._proc.stdin.write(pcm)
        except BrokenPipeError as e:
            raise RuntimeError("MP3 encoder exited") from e

    def close(self) -> None:
        if self._proc.stdin:
            try:
                self._proc.stdin.close()
            except BrokenPipeError:
                pass
        self._proc.wait(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
