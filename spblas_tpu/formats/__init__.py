from spblas_tpu.formats.csr import CSR
from spblas_tpu.formats.csc import CSC
from spblas_tpu.formats.coo import COO
from spblas_tpu.formats.bsr import BSR
from spblas_tpu.formats.convert import to_csr, to_csc, to_coo
