from spblas_tpu.ops.multiply import (multiply, multiply_inspect,
                                     multiply_compute, multiply_fill)
from spblas_tpu.ops.spmv import spmv
from spblas_tpu.ops.spmm import spmm
from spblas_tpu.ops.spgemm import (spgemm, spgemm_compute, spgemm_fill,
                                   SpgemmState)
from spblas_tpu.ops.add import add, add_inspect, add_compute
from spblas_tpu.ops.transpose import transpose, transpose_inspect
from spblas_tpu.ops.scale import scale
from spblas_tpu.ops.triangular_solve import (triangular_solve,
                                             triangular_solve_inspect)
