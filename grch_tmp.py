import numpy as np, time, random, tempfile, os, sys
from rabbitsalign_tpu.io.fasta import References
from rabbitsalign_tpu.index.params import IndexParameters
from rabbitsalign_tpu.index.strobemer_index import StrobemerIndex
from rabbitsalign_tpu.map.common import MappingParameters
from rabbitsalign_tpu.align.aligner import AlignmentParameters
from rabbitsalign_tpu.pipeline.native_pipeline import NativePipeline

N_CHR = 24
CHR_LEN = 130_000_000  # 3.12 Gbp total
rng = np.random.RandomState(11)
t0 = time.perf_counter()
refs = References()
base = np.frombuffer(b"ACGT", dtype=np.uint8)
chroms = []
for i in range(N_CHR):
    seq = rng.randint(0, 4, CHR_LEN).astype(np.uint8).choose(base).tobytes()
    chroms.append(seq)
    refs.add(f"chr{i+1}", seq)
print(f"genome gen {time.perf_counter()-t0:.0f}s ({sum(refs.lengths)/1e9:.2f} Gbp)", flush=True)

params = IndexParameters.from_read_length(150)
t0 = time.perf_counter()
index = StrobemerIndex(refs, params)
index.populate(0.0002, 1)
print(f"index build {time.perf_counter()-t0:.0f}s n={len(index)} "
      f"bits={index.bits} cutoff={index.filter_cutoff} "
      f"mem~{len(index)*16/1e9:.1f}GB", flush=True)

r = random.Random(3)
comp = {"A":"T","C":"G","G":"C","T":"A"}
f1 = tempfile.NamedTemporaryFile("w", suffix=".fq", delete=False, dir="/tmp")
f2 = tempfile.NamedTemporaryFile("w", suffix=".fq", delete=False, dir="/tmp")
truth = []
for i in range(20000):
    ci = r.randrange(N_CHR)
    st = r.randrange(0, CHR_LEN - 900)
    ins = max(180, min(700, int(r.gauss(350, 60))))
    g = chroms[ci]
    a = list(g[st:st+150].decode()); b = list(g[st+ins-150:st+ins].decode())
    for _ in range(3):
        a[r.randrange(150)] = r.choice("ACGT"); b[r.randrange(150)] = r.choice("ACGT")
    a = "".join(a); b = "".join(comp[c] for c in reversed("".join(b)))
    f1.write(f"@p{i}/1\n{a}\n+\n{'I'*150}\n"); f2.write(f"@p{i}/2\n{b}\n+\n{'I'*150}\n")
    truth.append((f"chr{ci+1}", st))
f1.close(); f2.close()
del chroms

ap = AlignmentParameters(); mp = MappingParameters(r=150)
mp.rescue_cutoff = min(2*index.filter_cutoff, 1000)
sink = []
warm = NativePipeline(index, params, refs, ap, mp, use_device=True)
warm.map_file(f1.name, f2.name, False, 4000, sink.append)
sink.clear()
p = NativePipeline(index, params, refs, ap, mp, use_device=True)
t0 = time.perf_counter()
n = p.map_file(f1.name, f2.name, False, 4000, sink.append)
el = time.perf_counter()-t0
print(f"GRCh38-scale PE: {n} reads in {el:.2f}s = {n/el:.0f} reads/s/core+chip", flush=True)
print({k: round(v,3) for k,v in p.engine.timers().items()}, flush=True)
ok = proper = tot = 0
for text in sink:
    for line in text.splitlines():
        f = line.split("\t")
        flag = int(f[1]); tot += 1
        if flag & 2: proper += 1
        if flag & 0x40 and not flag & 4:
            i = int(f[0][1:])
            if f[2] == truth[i][0] and abs(int(f[3]) - 1 - truth[i][1]) <= 5:
                ok += 1
print(f"records={tot} proper={proper/tot:.4f} r1_correct={ok/20000:.4f}", flush=True)
os.unlink(f1.name); os.unlink(f2.name)
