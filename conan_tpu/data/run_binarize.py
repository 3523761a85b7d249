"""Binarization CLI — ``python -m conan_tpu.data.run_binarize --config <yaml>``.

Reference-compatible entry (`/root/reference/data_gen/tts/runs/binarize.py:6-17`):
the config's ``binarizer_cls`` picks the binarizer (reference class paths are
aliased onto conan_tpu binarizers).
"""

from __future__ import annotations

import logging
import sys

from conan_tpu.config import set_hparams

logging.basicConfig(level=logging.INFO)

BINARIZER_ALIASES = {
    "data_gen.conan_binarizer.ConanBinarizer": "conan",
    "data_gen.conan_binarizer.EmformerBinarizer": "emformer",
    "conan": "conan", "emformer": "emformer",
}


def main(argv=None) -> None:
    hp = set_hparams(argv=argv if argv is not None else sys.argv[1:], save=False)
    kind = BINARIZER_ALIASES.get(hp.get("binarizer_cls", "conan"), "conan")
    if kind == "emformer":
        from conan_tpu.data.binarizer import EmformerBinarizer

        EmformerBinarizer(hp).process()
    else:
        from conan_tpu.data.binarizer import ConanBinarizer

        ConanBinarizer(hp).process()


if __name__ == "__main__":
    main()
