from flatquant_tpu.core.ste import round_ste
from flatquant_tpu.core.quant import (
    ActQuantCfg,
    WeightQuantCfg,
    act_fake_quant,
    act_scale_zero,
    asym_dequant,
    asym_quant,
    get_qmin_qmax,
    sym_dequant,
    sym_quant,
    weight_fake_quant,
    weight_find_params,
)
from flatquant_tpu.core.packing import pack_int4, unpack_int4
from flatquant_tpu.core.kron import get_decompose_dim, kronecker_matmul
from flatquant_tpu.core.orth import cayley, inverse_cayley, random_orthogonal
