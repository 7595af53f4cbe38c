"""Executable API documentation (VERDICT r1 item 9).

The reference runs its docs as tests (src/lib.rs:30-96, every public fn in
context.rs, operations.rs:51-203); this is the same contract here: the
doctest examples in the public modules' docstrings execute in CI.
"""

import doctest

import pytest

import homomorph_tpu
import homomorph_tpu.codec
import homomorph_tpu.context
import homomorph_tpu.operations

# modules whose docstrings carry executable examples; each must have at
# least one (attempted > 0 guards against silently losing them)
DOC_MODULES = [
    homomorph_tpu,
    homomorph_tpu.context,
    homomorph_tpu.operations,
    homomorph_tpu.codec,
]


@pytest.mark.parametrize("mod", DOC_MODULES, ids=lambda m: m.__name__)
def test_module_doctests(mod):
    result = doctest.testmod(
        mod, verbose=False, optionflags=doctest.IGNORE_EXCEPTION_DETAIL
    )
    assert result.attempted > 0, f"{mod.__name__} lost its doctests"
    assert result.failed == 0, f"{result.failed} doctest failure(s) in {mod.__name__}"
