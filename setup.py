from setuptools import find_packages, setup

setup(
    name="grounded_video_description_tpu",
    version="0.1.0",
    description="TPU-native grounded video description framework "
                "(JAX/XLA/Pallas)",
    packages=find_packages(
        include=["grounded_video_description_tpu",
                 "grounded_video_description_tpu.*"]),
    py_modules=["main"],
    package_data={
        "grounded_video_description_tpu.data": ["native/pack.cc",
                                                "native/Makefile"],
    },
    python_requires=">=3.10",
    install_requires=["jax", "optax", "orbax-checkpoint", "numpy",
                      "pyyaml", "h5py"],
    entry_points={
        "console_scripts": ["gvd-tpu=main:main"],
    },
)
