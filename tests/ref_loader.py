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


def _install_torchdyn_stub():
    """The reference integrates its NeuralODE on a fixed linspace grid with the
    euler solver (flow_f0.py:137-141); a fixed-step Euler stub reproduces it
    exactly, so the torchdyn dependency isn't needed for golden tests."""
    if "torchdyn" in sys.modules:
        return
    import torch

    class NeuralODE:
        def __init__(self, f, solver="euler", **kw):
            assert solver == "euler"
            self.f = f

        def __call__(self, x0, t_span):
            x = x0
            traj = [x0]
            for i in range(len(t_span) - 1):
                h = t_span[i + 1] - t_span[i]
                x = x + h * self.f(t_span[i], x, None)
                traj.append(x)
            return t_span, torch.stack(traj)

    torchdyn = types.ModuleType("torchdyn")
    core = types.ModuleType("torchdyn.core")
    core.NeuralODE = NeuralODE
    torchdyn.core = core
    sys.modules["torchdyn"] = torchdyn
    sys.modules["torchdyn.core"] = core


def _install_misc_stubs():
    """utils.audio drags in audio-IO deps unused by the model math
    (pyloudnorm, webrtcvad, skimage); empty stubs let the import chain
    resolve. scipy.ndimage.morphology moved in scipy 1.15+."""
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tf = types.ModuleType("torchaudio.transforms")

        class _Resample:  # only used for non-16k inputs in rmvpe inference
            def __init__(self, *a, **k):
                raise NotImplementedError

        tf.Resample = _Resample
        ta.transforms = tf
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tf
    for name in ("pretty_midi", "resampy"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "pyworld" not in sys.modules:
        sys.modules["pyworld"] = types.ModuleType("pyworld")
    for name in ("pyloudnorm", "webrtcvad"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        transform = types.ModuleType("skimage.transform")
        transform.resize = lambda *a, **k: None
        skimage.transform = transform
        sys.modules["skimage"] = skimage
        sys.modules["skimage.transform"] = transform
    if "scipy.ndimage.morphology" not in sys.modules:
        import scipy.ndimage

        morph = types.ModuleType("scipy.ndimage.morphology")
        morph.binary_dilation = scipy.ndimage.binary_dilation
        sys.modules["scipy.ndimage.morphology"] = morph


def load_reference():
    _install_librosa_stub()
    _install_torchdyn_stub()
    _install_misc_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)


def ref_hparams(d: dict):
    """Populate the reference's global hparams dict (some modules read it)."""
    load_reference()
    from utils.commons import hparams as ref_hp

    ref_hp.hparams.clear()
    ref_hp.hparams.update(d)
    return ref_hp.hparams
