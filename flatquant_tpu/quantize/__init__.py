from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.quantize.linear import LinearQuantState, fq_linear_train, bake_linear_weight
