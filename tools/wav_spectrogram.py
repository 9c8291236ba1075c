"""Audio-path inspection: spectrogram of a recorded WAV.

The ``tests/play_wav.py`` equivalent from the reference (plots a
spectrogram of ``output.wav`` to eyeball the MISO beam).  Usage::

    python tools/wav_spectrogram.py output.wav --plot spec.png
    python tools/wav_spectrogram.py output.wav            # text summary
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def spectrogram(data: np.ndarray, rate: float, nfft: int = 512, hop: int = 256):
    """[T] float -> (spec [F, frames] dB, freqs [F], times [frames])."""
    n_frames = max((len(data) - nfft) // hop + 1, 0)
    if n_frames == 0:
        return np.zeros((nfft // 2 + 1, 0)), np.fft.rfftfreq(nfft, 1 / rate), np.array([])
    window = np.hanning(nfft)
    frames = np.stack(
        [data[i * hop : i * hop + nfft] * window for i in range(n_frames)]
    )
    spec = np.abs(np.fft.rfft(frames, axis=-1)).T          # [F, frames]
    db = 20.0 * np.log10(np.maximum(spec, 1e-12))
    freqs = np.fft.rfftfreq(nfft, 1.0 / rate)
    times = (np.arange(n_frames) * hop + nfft / 2) / rate
    return db, freqs, times


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("wav")
    ap.add_argument("--plot", default=None, help="save spectrogram PNG")
    ap.add_argument("--channel", type=int, default=0)
    args = ap.parse_args(argv)

    from beamforming_lk_tpu.io.wav import read_wav

    data, rate = read_wav(args.wav)
    sig = data[args.channel]
    db, freqs, times = spectrogram(sig, rate)
    rms = float(np.sqrt(np.mean(np.square(sig))))
    print(f"{args.wav}: {data.shape[0]} ch x {data.shape[1]} samples @ {rate:.0f} Hz")
    print(f"rms {rms:.4f}, peak {float(np.abs(sig).max()):.4f}")
    if db.size:
        f_peak = freqs[int(np.argmax(db.mean(axis=1)))]
        print(f"dominant frequency ~{f_peak:.0f} Hz")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 4))
        ax.imshow(
            db, origin="lower", aspect="auto",
            extent=[times[0] if len(times) else 0,
                    times[-1] if len(times) else 1,
                    freqs[0], freqs[-1]],
            cmap="magma",
        )
        ax.set_xlabel("time [s]")
        ax.set_ylabel("frequency [Hz]")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"plot -> {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
