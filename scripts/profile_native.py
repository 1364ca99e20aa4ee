"""In-process PC-sampling profile of the pipeline (scripts/pc_sampler.c).

    python scripts/profile_native.py <sample_dir> [threads] [hz]

Runs the full CLI pipeline in-process with SIGPROF sampling and prints the
top native functions (resolved via /proc/self/maps + addr2line) and the
per-.so sample split. Dev tool; requires the extension built with -g
(native/build.sh keeps symbols for function-level resolution either way).
"""
import bisect
import collections
import ctypes
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SO = "/tmp/pc_sampler.so"
subprocess.run(["gcc", "-O2", "-shared", "-fPIC",
                os.path.join(REPO, "scripts", "pc_sampler.c"), "-o", SO],
               check=True)
lib = ctypes.CDLL(SO)
lib.sampler_start.argtypes = [ctypes.c_int, ctypes.c_size_t]
lib.sampler_stop.argtypes = [ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t]
lib.sampler_stop.restype = ctypes.c_size_t


def run(sample, threads, hz):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    sys.argv = ["arriba_tpu",
                "-x", os.path.join(sample, "aligned.sam"),
                "-g", os.path.join(sample, "genes.gtf"),
                "-a", os.path.join(sample, "genome.fa"),
                "-b", os.path.join(sample, "blacklist.tsv"),
                "-s", "no",
                "-o", "/tmp/prof_fusions.tsv",
                "-O", "/tmp/prof_fusions.disc.tsv",
                "-@", str(threads)]
    from arriba_tpu.cli import main
    cap = 2_000_000
    # PROFILE_PAIRS=1 caller attribution exists in pc_sampler.c but can
    # stall the scan under frequent signals; default to leaf-only sampling
    lib.sampler_start(hz, cap)
    status = main()
    buf = (ctypes.c_uint64 * cap)()
    n = lib.sampler_stop(buf, cap)
    assert status == 0, status
    return list(buf[:n])


def maps():
    out = []
    for line in open("/proc/self/maps"):
        parts = line.split()
        if len(parts) < 6 or "x" not in parts[1]:
            continue
        lo, hi = (int(x, 16) for x in parts[0].split("-"))
        out.append((lo, hi, int(parts[2], 16), parts[5]))
    out.sort()
    return out


def main():
    sample = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/arriba_tpu_bench_genome_scale_v3"
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else os.cpu_count()
    hz = int(sys.argv[3]) if len(sys.argv) > 3 else 397
    pcs = run(sample, threads, hz)
    pairs_mode = os.environ.get("PROFILE_PAIRS") == "1"
    mm = maps()
    los = [m[0] for m in mm]

    if pairs_mode:
        # attribute each libc leaf sample to its CALLER in our .so
        native_path = next((m[3] for m in mm
                            if "_native.cpython" in m[3]), None)
        callers = collections.Counter()
        for i in range(0, len(pcs) - 1, 2):
            leaf, ret = pcs[i], pcs[i + 1]
            j = bisect.bisect_right(los, leaf) - 1
            if j < 0 or leaf >= mm[j][1] or "libc" not in mm[j][3]:
                continue
            k = bisect.bisect_right(los, ret) - 1
            if k < 0 or ret >= mm[k][1] or mm[k][3] != native_path:
                callers["<non-native caller>"] += 1
                continue
            callers[ret - mm[k][0] + mm[k][2]] += 1
        resolved = collections.Counter()
        addrs = [c for c in callers if isinstance(c, int)]
        for i in range(0, len(addrs), 4000):
            batch = [f"0x{a:x}" for a in addrs[i:i + 4000]]
            out = subprocess.run(["addr2line", "-f", "-C", "-e",
                                  native_path] + batch,
                                 capture_output=True, text=True)
            lines = out.stdout.splitlines()
            for j, a in enumerate(addrs[i:i + 4000]):
                fn = lines[2 * j] if 2 * j < len(lines) else "??"
                resolved[fn] += callers[a]
        resolved["<non-native caller>"] = callers.get("<non-native caller>",
                                                      0)
        total_libc = sum(resolved.values()) or 1
        print(f"\nlibc leaf samples attributed to native callers"
              f" ({total_libc}):")
        for fn, count in resolved.most_common(25):
            print(f"  {100 * count / total_libc:5.1f}%  {count:6d}  "
                  f"{str(fn)[:100]}")
        return
    by_so = collections.Counter()
    offsets = collections.defaultdict(list)
    for pc in pcs:
        i = bisect.bisect_right(los, pc) - 1
        if i < 0 or pc >= mm[i][1]:
            by_so["<unknown>"] += 1
            continue
        lo, _hi, file_off, path = mm[i]
        by_so[path] += 1
        if ".so" in path and "site-packages" not in path:
            offsets[path].append(pc - lo + file_off)

    total = max(1, len(pcs))
    print(f"\n{len(pcs)} samples @{hz}Hz (cpu-time, all threads)")
    print("\nper mapping:")
    for path, count in by_so.most_common(12):
        print(f"  {100 * count / total:5.1f}%  {count:7d}  {path}")

    for path, offs in offsets.items():
        if len(offs) < total * 0.02:
            continue
        counted = collections.Counter(offs)
        funcs = collections.Counter()
        if "libc" in path or "libstdc++" in path:
            # stripped system libraries: bisect the dynamic symbol table
            syms = []
            out = subprocess.run(["nm", "-D", "--defined-only", path],
                                 capture_output=True, text=True)
            for line in out.stdout.splitlines():
                parts = line.split()
                if len(parts) == 3 and parts[1] in ("T", "t", "W", "i"):
                    syms.append((int(parts[0], 16), parts[2]))
            syms.sort()
            addrs_only = [s[0] for s in syms]
            for off, count in counted.items():
                i = bisect.bisect_right(addrs_only, off) - 1
                funcs[syms[i][1] if i >= 0 else "??"] += count
        else:
            # addr2line in manageable batches
            addrs = [f"0x{o:x}" for o in counted]
            for i in range(0, len(addrs), 5000):
                batch = addrs[i:i + 5000]
                out = subprocess.run(["addr2line", "-f", "-C", "-e", path]
                                     + batch, capture_output=True, text=True)
                lines = out.stdout.splitlines()
                for j, addr in enumerate(batch):
                    fn = lines[2 * j] if 2 * j < len(lines) else "??"
                    funcs[fn] += counted[int(addr, 16)]
        print(f"\ntop functions in {os.path.basename(path)}:")
        for fn, count in funcs.most_common(30):
            print(f"  {100 * count / total:5.1f}%  {count:7d}  {fn[:100]}")


if __name__ == "__main__":
    main()
