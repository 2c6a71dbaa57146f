from setuptools import find_packages, setup

setup(
    name="mccnn-tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) stereo-matching framework with the "
        "capabilities of MC-CNN-python"
    ),
    packages=find_packages(include=["mccnn_tpu", "mccnn_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "optax"],
    entry_points={
        "console_scripts": [
            "mccnn-train=mccnn_tpu.cli.train:main",
            "mccnn-match=mccnn_tpu.cli.match:main",
        ]
    },
)
