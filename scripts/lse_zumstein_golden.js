#!/usr/bin/env node
/* Golden harness for the zumsteinVector mode of the LSE analyzer.
 *
 * Extracts `elementTypes`, `classifiedElement`, `lineElement`,
 * `setToAnalyze`, `createLocalDataset` and `sectorizeLineElements`
 * VERBATIM from the read-only reference source
 * (lib/lineSegmentAnalyzer.js) and runs createLocalDataset with
 * {zumsteinVector: true} in a vm sandbox. The only dependencies the
 * zumstein branch touches are the pure `regLib.matchNumber` and
 * `utils.createSeriesOfCharacter`, which are cut verbatim from
 * lib/regexLib.js / lib/utils.js (the cheerio-requiring remainder of
 * utils.js is never loaded).
 *
 * stdin:  JSON [[line, ...], ...]   (list of cases; each case = lines)
 * stdout: JSON list of per-case results:
 *           {"elements": [[lineIndex, type, content, sector], ...]}
 *         or {"error": "..."} when the reference itself throws (e.g. a
 *         line with no special-character match hits null.length).
 */
'use strict';
const fs = require('fs');
const vm = require('vm');

const LSA = '/root/reference/lib/lineSegmentAnalyzer.js';
const REG = '/root/reference/lib/regexLib.js';
const UTL = '/root/reference/lib/utils.js';

function cutter(src) {
  return function cut(decl, name) {
    const start = src.indexOf(decl + ' ' + name);
    if (start < 0) throw new Error('not found: ' + name);
    let i = src.indexOf('{', start), depth = 0;
    for (; i < src.length; i++) {
      if (src[i] === '{') depth++;
      else if (src[i] === '}') { depth--; if (depth === 0) break; }
    }
    // include a trailing `;` for const/var declarations
    return src.slice(start, i + 1) + (decl === 'function' ? '' : ';');
  };
}

const cutLsa = cutter(fs.readFileSync(LSA, 'utf8'));
const cutReg = cutter(fs.readFileSync(REG, 'utf8'));
const cutUtl = cutter(fs.readFileSync(UTL, 'utf8'));

const code = [
  'var SEGMENT_NUM = 10;',
  'var USE_ZUMSTEIN_VECTOR = false;',
  'var setOfLines = [];',
  'var _setToAnalyze;',
  cutReg('function', 'matchNumber'),
  cutUtl('function', 'createSeriesOfCharacter'),
  'var regLib = { matchNumber: matchNumber };',
  'var utils = { createSeriesOfCharacter: createSeriesOfCharacter };',
  cutLsa('const', 'elementTypes'),
  cutLsa('function', 'classifiedElement'),
  cutLsa('function', 'lineElement'),
  cutLsa('function', 'setToAnalyze'),
  cutLsa('function', 'sectorizeLineElements'),
  cutLsa('function', 'createLocalDataset'),
].join('\n');

const cases = JSON.parse(fs.readFileSync(0, 'utf8'));
const results = [];
for (const lines of cases) {
  // non-strict context: createLocalDataset assigns the implicit global
  // `match` exactly as the reference does under plain `node lib/...`
  const ctx = { console: { log: () => {} } };
  vm.createContext(ctx);
  try {
    vm.runInContext(
      code +
      '\nsetOfLines = ' + JSON.stringify(lines) + ';' +
      '\ncreateLocalDataset({name: "t", zumsteinVector: true});' +
      '\n_result = _setToAnalyze.lineElements.map(function (le) {' +
      '  return le.classifiedElements.map(function (ce) {' +
      '    return [ce.lineIndex, ce.type, ce.content, ce.sectorPosition];' +
      '  });' +
      '});',
      ctx);
    results.push({ elements: [].concat.apply([], ctx._result) });
  } catch (e) {
    results.push({ error: String(e && e.message || e) });
  }
}
process.stdout.write(JSON.stringify(results));
