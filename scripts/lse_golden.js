#!/usr/bin/env node
/* Golden harness for the LSE streak-grouping port.
 *
 * Extracts `sectorOccurence`, `elementStreak` and `doGrouping` VERBATIM
 * from the read-only reference source (lib/lineSegmentAnalyzer.js) and runs
 * them in a vm sandbox on a histogram read from stdin, so the Python port
 * (akf_cdparser_spark/analytics/lse_grouping.py) can be asserted equal to
 * the reference's actual behavior without installing the reference's npm
 * dependencies (exceljs etc. are never touched by these three functions).
 *
 * stdin:  JSON [{"class": {"sector": ctr, ...}, ...}, ...]  (list of cases)
 * stdout: JSON list of per-case rows [key, sector, ctr, groupSize]
 */
'use strict';
const fs = require('fs');
const vm = require('vm');

const SRC = '/root/reference/lib/lineSegmentAnalyzer.js';
const src = fs.readFileSync(SRC, 'utf8');

function cutFunction(name) {
  const start = src.indexOf('function ' + name + '(');
  if (start < 0) throw new Error('not found: ' + name);
  let i = src.indexOf('{', start), depth = 0;
  for (; i < src.length; i++) {
    if (src[i] === '{') depth++;
    else if (src[i] === '}') { depth--; if (depth === 0) break; }
  }
  return src.slice(start, i + 1);
}

const code = [
  'var GROUPING_RANGE = 1;',
  cutFunction('sectorOccurence'),
  cutFunction('elementStreak'),
  cutFunction('doGrouping'),
].join('\n');

const cases = JSON.parse(fs.readFileSync(0, 'utf8'));
const results = [];
for (const classSectors of cases) {
  const N = 10;
  const holder = [];
  for (let s = 0; s < N; s++) holder.push({});
  if (Array.isArray(classSectors.__entries__)) {
    // explicit per-(key, sector) insertion order: [[key, sector, ctr], ...]
    // inserted in list order — models the reference's line-scan insertion
    // (sectorsHolder[sectorPosition][key] created at first appearance),
    // which the class-major object form below cannot express
    for (const [key, s, ctr] of classSectors.__entries__) {
      holder[Number(s)][key] = {
        ctr: ctr, content: [], groupingChecked: false,
        isGroup: false, groupSize: 0,
      };
    }
  } else {
  for (const key of Object.keys(classSectors)) {
    const bySector = classSectors[key];
    for (const s of Object.keys(bySector)) {
      holder[Number(s)][key] = {
        ctr: bySector[s], content: [], groupingChecked: false,
        isGroup: false, groupSize: 0,
      };
    }
  }
  }
  const ctx = { console: { log: () => {} }, _sectorsHolder: holder };
  vm.createContext(ctx);
  vm.runInContext(code + '\ndoGrouping();', ctx);
  const rows = [];
  for (let s = 0; s < N; s++) {
    const sector = ctx._sectorsHolder[s];
    for (const key of Object.keys(sector)) {
      const el = sector[key];
      rows.push([key, s, el.ctr, el.isGroup ? el.groupSize : 0]);
    }
  }
  results.push(rows);
}
process.stdout.write(JSON.stringify(results));
