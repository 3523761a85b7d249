"""Import the mounted PyTorch reference (/root/reference) for golden tests.

The reference lists librosa as a dep but this image lacks it; we stub just
``librosa.filters.mel`` with our own filterbank (itself snapshot-tested) so
reference modules import. The reference is used READ-ONLY as a numerical
oracle — no code is copied from it.
"""

import sys
import types

REF = "/root/reference"


def _install_librosa_stub():
    if "librosa" in sys.modules:
        return
    from conan_tpu.ops.stft import mel_filterbank_np

    librosa = types.ModuleType("librosa")
    filters = types.ModuleType("librosa.filters")

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        fmax = sr / 2 if fmax is None else fmax
        return mel_filterbank_np(sr, n_fft, n_mels, float(fmin), float(fmax))

    filters.mel = mel
    librosa.filters = filters
    sys.modules["librosa"] = librosa
    sys.modules["librosa.filters"] = filters


def load_reference():
    _install_librosa_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)


def ref_hparams(d: dict):
    """Populate the reference's global hparams dict (some modules read it)."""
    load_reference()
    from utils.commons import hparams as ref_hp

    ref_hp.hparams.clear()
    ref_hp.hparams.update(d)
    return ref_hp.hparams
