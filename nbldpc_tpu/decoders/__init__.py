"""Iterative NB-LDPC decoders: QSPA, EMS, T-EMS (SURVEY.md C8–C12).

All decoders share the flooding-schedule skeleton in `common.decode` and
differ only in the check-node update. Messages are log-domain
[B, M, dc_max, q] in CN-major layout (see graph.py).
"""

from nbldpc_tpu.decoders.common import DecodeResult, decode
from nbldpc_tpu.decoders.qspa import qspa_cn_update
