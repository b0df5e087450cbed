"""Test harness: run everything on CPU with 8 virtual devices so the
data-parallel / sharded paths (psum, shard_map, mesh shardings) execute in CI
without TPU hardware — the strategy SURVEY.md section 4 prescribes.

The container's sitecustomize force-registers the TPU PJRT plugin whenever
PALLAS_AXON_POOL_IPS is set (overriding JAX_PLATFORMS), and that happens at
interpreter start — before any conftest runs. So if we detect the TPU env,
re-exec pytest once with a sanitized environment."""

import os
import sys

_SENTINEL = "GNERF_TEST_REEXEC"

if os.environ.get(_SENTINEL) != "1" and os.environ.get("PALLAS_AXON_POOL_IPS"):
    import subprocess

    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip TPU plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "collective_timeout" not in flags:
        # 8 virtual devices on few cores: relax the collective deadline.
        flags += " --xla_cpu_collective_timeout_seconds=1200"
    env["XLA_FLAGS"] = flags.strip()
    args = sys.argv[1:] if sys.argv[0].endswith((".py", "pytest")) else sys.argv
    # The parent pytest's fd-level capture would swallow the child's output;
    # tee it to a log file and (best effort) the controlling terminal.
    log_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".last_run.log")
    sinks = [open(log_path, "wb")]
    try:
        sinks.append(open("/dev/tty", "wb"))
    except OSError:
        pass
    proc = subprocess.Popen(
        [sys.executable, "-m", "pytest"] + args, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    for line in proc.stdout:
        for sink in sinks:
            sink.write(line)
            sink.flush()
        try:
            os.write(1, line)
        except OSError:
            pass
    proc.wait()
    for sink in sinks:
        sink.close()
    os._exit(proc.returncode)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
