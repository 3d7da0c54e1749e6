from setuptools import find_packages, setup

setup(
    name='msmdfusion_tpu',
    version='0.1.0',
    description='TPU-native multi-modal 3D detection framework '
                '(JAX/XLA/Pallas re-design of the MSMDFusion stack)',
    packages=find_packages(exclude=('tests', 'tools', 'configs')),
    python_requires='>=3.10',
)
