"""Build hook: compile the native codec core into the wheel.

The pure-Python package works without it (quant/native.py degrades to the
numpy codecs), but a wheel built where a C++ toolchain exists ships
``biogpt_tpu/_lib/libbiogpt_io.so`` so installed environments get the fast
checkpoint-streaming codecs without needing make at runtime.
"""

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = Path(__file__).resolve().parent


class BuildWithNative(build_py):
    def run(self):
        super().run()
        csrc = ROOT / "csrc"
        so = csrc / "libbiogpt_io.so"
        try:
            subprocess.run(["make", "-C", str(csrc)], check=True,
                           capture_output=True, timeout=300)
        except (OSError, subprocess.SubprocessError):
            return  # no toolchain: ship pure-Python, numpy codecs take over
        if so.exists():
            dst = Path(self.build_lib) / "biogpt_tpu" / "_lib"
            dst.mkdir(parents=True, exist_ok=True)
            shutil.copy2(so, dst / so.name)


setup(cmdclass={"build_py": BuildWithNative})
