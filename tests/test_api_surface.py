"""API-surface inventory test.

Walks the reference's full NDArray method table
(/root/reference/numpower.c:5034-5209, ~140 entries) and asserts every entry
has a counterpart in numpower_tpu — either an NDArray attribute, a
functional op, or a documented equivalent. This is SURVEY.md §2's component
inventory as an executable checklist.
"""

import pytest

from numpower_tpu import NDArray, ops

# Every method registered in the reference's class_NDArray_methods table.
REFERENCE_METHODS = """
__construct __serialize __toString __unserialize abs add all allclose append
arange arccos arccosh arcsin arcsinh arctan arctan2 arctanh argmax argmin
array atleast_1d atleast_2d atleast_3d average ceil cholesky clip
column_stack concatenate cond convolve2d copy correlate2d cos cosh count cpu
current degrees det diag diagonal divide dnn_conv1d_forward
dnn_conv2d_backward dnn_conv2d_forward dot dstack dump dumpDevices eig equal
exp exp2 expand_dims expm1 fill fix flatten flip floor fromImage full gpu
greater greater_equal hstack identity inner inv isGPU key less less_equal
load log log10 log1p log2 logb lstsq lu matmul matrix_rank max maximum mean
median min minimum mod moveaxis multiply negative next norm normal not_equal
offsetExists offsetGet offsetSet offsetUnset ones outer poisson positive pow
prod qr quantile radians random_binomial reciprocal reshape rewind rint
rollaxis round rsqrt save setDevice shape sign sin sinc sinh size slice
solve sqrt square squeeze standard_normal std subtract sum svd swapaxes tan
tanh toArray toImage trace transpose trunc uniform valid variance vstack
zeros
""".split()

# Methods whose counterpart is a Python protocol / different spelling.
PROTOCOL_EQUIVALENTS = {
    "__construct": "__init__",
    "__serialize": "__getstate__",
    "__unserialize": "__setstate__",
    "__toString": "__str__",
    "offsetExists": "__contains__",
    "offsetGet": "__getitem__",
    "offsetSet": "__setitem__",
    "toArray": "toArray",
    "fix": "fix",
}

# PHP-only surface with no Python analogue needed: offsetUnset would delete
# an element of a fixed-shape tensor (the reference throws at runtime too).
EXEMPT = {"offsetUnset"}


@pytest.mark.parametrize("name", sorted(set(REFERENCE_METHODS)))
def test_reference_method_has_counterpart(name):
    if name in EXEMPT:
        pytest.skip("PHP-only; reference throws at runtime as well")
    target = PROTOCOL_EQUIVALENTS.get(name, name)
    assert hasattr(NDArray, target) or hasattr(ops, target), (
        f"reference NDArray::{name} has no counterpart "
        f"(looked for NDArray.{target} / ops.{target})"
    )


def test_functional_layer_covers_class_math():
    # every math/logic/reduction method also exists functionally
    for name in [
        "add", "subtract", "multiply", "divide", "pow", "mod", "abs", "sqrt",
        "rsqrt", "exp", "log", "sin", "cos", "tanh", "clip", "equal",
        "greater", "less", "all", "allclose", "sum", "prod", "mean", "median",
        "min", "max", "argmin", "argmax", "std", "variance", "quantile",
        "average", "matmul", "dot", "inner", "outer", "cholesky", "solve",
        "inv", "det", "lu", "qr", "svd", "eig", "norm", "cond", "matrix_rank",
        "lstsq", "trace", "convolve2d", "correlate2d", "transpose", "reshape",
        "flatten", "flip", "squeeze", "expand_dims", "concatenate",
    ]:
        assert hasattr(ops, name), f"ops.{name} missing"


def test_arithmetic_operand_class_registered():
    """Reference registers ArithmeticOperand alongside NDArray
    (numpower.c:5030, :5228-5244) with a no-arg constructor."""
    from numpower_tpu import ArithmeticOperand

    ArithmeticOperand()  # constructible with no args, like the reference
