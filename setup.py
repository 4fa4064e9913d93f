"""Build hook: compile the native SPSC frame-ring transport into the package.

The C++ side (native/frame_ring.cpp) is a plain shared library loaded via
ctypes (no Python C API), so the standard Extension machinery does not apply;
a build_py hook runs the Makefile and drops libhrt_native.so next to the
package sources. Failure is non-fatal — hopperrender_tpu.native falls back to
NumPy ring implementations (same contract, tested in
tests/test_native_pipeline.py)."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        root = Path(__file__).parent
        native_dir = root / "native"
        so = native_dir / "libhrt_native.so"
        try:
            subprocess.run(["make", "-C", str(native_dir)], check=True,
                           capture_output=True, timeout=300)
        except (subprocess.SubprocessError, FileNotFoundError) as exc:
            print(f"warning: native build skipped ({exc}); "
                  "the package will use NumPy ring fallbacks")
            return
        if so.exists() and self.build_lib:
            dest = Path(self.build_lib) / "hopperrender_tpu" / so.name
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(so, dest)


setup(cmdclass={"build_py": BuildWithNative})
