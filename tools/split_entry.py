#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala's two giant maps into
per-family registration modules under graft.registry (round-11 verdict
directive #4). Parses the literal Map entries, assigns each to the
family named by its `// ── ... ──` section header, and emits
<Family>Reg.scala files plus a shared Memo.scala holding the
cross-query memoized prefixes and oracle CTE builders. Run once from
the repo root; verify with sbt test + Verify (zero board delta)."""
import re, sys, os

SRC = 'src/main/scala/graft/SparkEntry.scala'
lines = open(SRC).read().split('\n')

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit('not found')

q_open = find(lambda l: l.startswith('  def queries:'))
o_open = find(lambda l: l.startswith('  def oracleSql: Map[String, String] = Map('))
aux_open = find(lambda l: l.startswith('  def auxTables:'))

def map_close(open_idx):
    # the Map( literal closes at the first '  )' line at 2-space indent
    for i in range(open_idx + 1, len(lines)):
        if lines[i] == '  )':
            return i
    raise SystemExit('close not found')

q_close = map_close(q_open)
o_close = map_close(o_open)

ENTRY = re.compile(r'^    "([a-z0-9_]+)" ->')
HDR = re.compile(r'^    // ──')

def parse_entries(a, b):
    """Return (ordered list of (name, family, text)), given entry region
    [a, b) of lines (inside the Map literal)."""
    out = []
    fam = None
    i = a
    pend = []          # pending comment/blank lines for next entry
    cur = None         # (name, fam, [lines])
    while i < b:
        l = lines[i]
        if HDR.match(l):
            # flush current entry
            if cur: out.append(cur); cur = None
            hdr = [l]
            while not hdr[-1].rstrip().endswith('──'):
                i += 1
                hdr.append(lines[i])
            fam = hdr[0]
            pend = []          # drop header from entry text; kept separately
            headers.setdefault(fam_name(fam), '\n'.join(hdr))
            i += 1
            continue
        m = ENTRY.match(l)
        if m:
            if cur: out.append(cur); cur = None
            cur = [m.group(1), fam_name(fam), pend + [l]]
            pend = []
        elif l.strip().startswith('//') or l.strip() == '':
            # comment/blank: could belong to next entry
            if cur and l.strip() == '':
                cur[2].append(l)
            else:
                if cur and l.strip().startswith('//') and False:
                    pass
                pend.append(l)
        else:
            if cur is None:
                raise SystemExit(f'orphan line {i+1}: {l!r}')
            cur[2].extend(pend); pend = []
            cur[2].append(l)
        i += 1
    if cur: out.append(cur)
    return out

FAMS = {
    'Flagship': 'core', 'Ingest chain': 'core', 'S4': 'core',
    'Relational breadth': 'relational',
    'Events': 'events',
    'Market-analytics': 'market',
    'Dedup family': 'dedup',
    'Similarity search': 'similarity',
    'Deterministic sampling': 'sampling',
    'Text analysis': 'text',
    'Multimodal': 'multimodal',
    'Distribution drift': 'drift',
}
headers = {}

def fam_name(hdr_line):
    if hdr_line is None:
        return None
    for k, v in FAMS.items():
        if k in hdr_line:
            return v
    raise SystemExit(f'unknown family header: {hdr_line}')

q_entries = parse_entries(q_open + 1, q_close)
fam_of = {n: f for n, f, _ in q_entries}

# oracle entries inherit family from the query with the same name
o_entries = []
i0 = o_open + 1
raw = parse_entries_oracle = None
# reuse parser but families come from fam_of
fam = None
pend = []
cur = None
res = []
i = i0
while i < o_close:
    l = lines[i]
    m = ENTRY.match(l)
    if m:
        if cur: res.append(cur); cur = None
        cur = [m.group(1), fam_of.get(m.group(1)), pend + [l]]
        if cur[1] is None:
            raise SystemExit(f'oracle without query: {m.group(1)}')
        pend = []
    elif l.strip().startswith('//') or l.strip() == '':
        if cur and l.strip() == '':
            cur[2].append(l)
        else:
            pend.append(l)
    else:
        if cur is None:
            raise SystemExit(f'orphan oracle line {i+1}: {l!r}')
        cur[2].extend(pend); pend = []
        cur[2].append(l)
    i += 1
if cur: res.append(cur)
o_entries = res

def strip_trailing_comma(txt_lines):
    t = list(txt_lines)
    while t and t[-1].strip() == '':
        t.pop()
    if t[-1].rstrip().endswith(','):
        t[-1] = t[-1].rstrip()[:-1]
    return t

# per-family report
from collections import defaultdict
qf, of = defaultdict(list), defaultdict(list)
for n, f, t in q_entries: qf[f].append((n, t))
for n, f, t in o_entries: of[f].append((n, t))
print('family  queries  q_lines  o_lines')
for f in dict.fromkeys(list(qf)):
    ql = sum(len(t) for _, t in qf[f])
    ol = sum(len(t) for _, t in of[f])
    print(f'{f:12s} {len(qf[f]):4d} {ql:7d} {ol:7d}')
print('total q', len(q_entries), 'o', len(o_entries))

if '--dry' in sys.argv:
    sys.exit(0)

# ---------- emit ----------
OPS_IMPORT = 'import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}'

def emit(fam, qpart, opart, suffix=''):
    name = fam.capitalize() + suffix + 'Reg'
    path = f'src/main/scala/graft/registry/{name}.scala'
    body = []
    body.append('package graft.registry')
    body.append('')
    body.append('import org.apache.spark.sql.{DataFrame, SparkSession}')
    body.append('import org.apache.spark.sql.functions._')
    body.append('')
    body.append('import graft.{Sql, Tables}')
    body.append('import graft.ingest.TradeIngest')
    body.append(OPS_IMPORT)
    body.append('import Memo._')
    body.append('')
    body.append(f'/** {fam.capitalize()} family registration — query lambdas and their')
    body.append('  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and')
    body.append('  * comments verbatim from the original registration map. */')
    body.append(f'private[graft] object {name} {{')
    hdr = headers.get(fam)
    if hdr and not suffix.endswith('B'):
        body.append(hdr.replace('    //', '  //'))
    body.append('  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(')
    chunks = []
    for n, t in qpart:
        chunks.append('\n'.join(strip_trailing_comma(t)))
    body.append(',\n'.join(chunks))
    body.append('  )')
    body.append('')
    body.append('  def sql: Map[String, String] = Map(')
    chunks = []
    for n, t in opart:
        chunks.append('\n'.join(strip_trailing_comma(t)))
    body.append(',\n'.join(chunks) if chunks else '')
    body.append('  )')
    body.append('}')
    open(path, 'w').write('\n'.join(body) + '\n')
    print('wrote', path, sum(1 for _ in open(path)))
    return name

os.makedirs('src/main/scala/graft/registry', exist_ok=True)
names = []
MAX = 2300
for f in dict.fromkeys(list(qf)):
    qs, osql = qf[f], of[f]
    total = sum(len(t) for _, t in qs) + sum(len(t) for _, t in osql)
    if total > MAX:
        # split by name at the midpoint of combined size, keeping each
        # query's oracle in the same module
        sizes = {n: len(t) for n, t in qs}
        for n, t in osql: sizes[n] = sizes.get(n, 0) + len(t)
        acc, first = 0, set()
        for n, _ in qs:
            if acc < total / 2:
                first.add(n); acc += sizes.get(n, 0)
        names.append(emit(f, [e for e in qs if e[0] in first],
                          [e for e in osql if e[0] in first], 'A'))
        names.append(emit(f, [e for e in qs if e[0] not in first],
                          [e for e in osql if e[0] not in first], 'B'))
    else:
        names.append(emit(f, qs, osql))
print('modules:', names)
open('/tmp/reg_modules.txt', 'w').write('\n'.join(names))
