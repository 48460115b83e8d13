"""Build the _fastio C extension in place:

    cd fscl_tpu/native && python setup.py build_ext --inplace
"""

from setuptools import Extension, setup

setup(
    name="fscl-tpu-fastio",
    ext_modules=[
        Extension(
            "_fastio",
            sources=["fastio.c"],
            extra_compile_args=["-O2"],
        )
    ],
)
