#!/usr/bin/env python3
"""Regenerate COVERAGE.md's canonical per-family query tables.

Walks src/main/scala/graft for GraftQuery definitions, maps each
registered query name to its definition site, groups by family, and
rewrites everything between the '## Extension surface' header and the
'## Non-query engine surface' header in COVERAGE.md. Run from the repo
root after adding queries.
"""
import collections
import json
import os
import re

def query_locations():
    locs = {}
    for root, _, files in os.walk('src/main/scala/graft'):
        for f in files:
            if not f.endswith('.scala'):
                continue
            p = os.path.join(root, f)
            lines = open(p).read().split('\n')
            for i, l in enumerate(lines):
                if 'GraftQuery(' not in l:
                    continue
                for j in range(i, min(i + 3, len(lines))):
                    m = re.search(r'"([a-z0-9_]+)"', lines[j])
                    if m:
                        locs[m.group(1)] = (
                            f"{p.replace('src/main/scala/', '')}:{j + 1}")
                        break
    return locs

FILE_FAMILY = {'Relational.scala': 'relational', 'Analytics.scala': 'analytics',
               'Temporal.scala': 'temporal', 'TpchShapes.scala': 'relational'}
PREFIX_FAMILY = {'cluster': 'dedup', 'retrieval': 'text', 'pipeline': 'text',
                 'feat': 'ml', 'mm': 'multimodal', 'sim': 'similarity',
                 'sample': 'sampling'}
ORDER = ['relational', 'analytics', 'temporal', 'graph', 'mining', 'dedup',
         'similarity', 'multimodal', 'text', 'sampling', 'ml', 'stream']

def family(name, loc):
    if re.match(r'q\d+', name):
        return FILE_FAMILY[loc.split(':')[0].split('/')[-1]]
    return PREFIX_FAMILY.get(name.split('_')[0], name.split('_')[0])

def tables(locs):
    fams = collections.defaultdict(list)
    for n, loc in locs.items():
        fams[family(n, loc)].append((n, loc))
    out = []
    for f in ORDER:
        rows = sorted(fams.pop(f))
        out += [f"### {f} ({len(rows)} queries)", "",
                "| query | where |", "|---|---|"]
        out += [f"| `{n}` | `{loc}` |" for n, loc in rows]
        out.append("")
    assert not fams, f"unmapped families: {sorted(fams)}"
    return '\n'.join(out)

def main():
    locs = query_locations()
    doc = open('COVERAGE.md').read()
    start = doc.index('### relational')
    end = doc.index('## Non-query engine surface')
    open('COVERAGE.md', 'w').write(doc[:start] + tables(locs) + doc[end:])
    print(f"regenerated canonical tables for {len(locs)} queries")

if __name__ == '__main__':
    main()
