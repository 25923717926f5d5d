"""TPU-native compute kernels (XLA-structured formulations + Pallas).

Each module here is the TPU equivalent of one of the reference's native
C++/CUDA components (SURVEY.md §2.1): ``iir`` ↔ libtorchaudio lfilter core
loop, ``viterbi`` ↔ forced_align, ``rnnt`` ↔ the transducer loss, ``ctc`` ↔
the cuctc prefix beam search.
"""

from . import iir  # noqa: F401
