// Drive the REAL reference lineSegmentAnalyzer on a set of lines and dump
// the two xlsx cell grids (ungrouped + grouped) as JSON via the exceljs
// stand-in. Input: JSON file {lines: [...], name: str, zumstein: bool}.
// Mirrors parser.js doLineSegmentAnalysis (lib/parser.js:1925-1957).
const fs = require('fs');
const origLog = console.log;
console.log = () => {};
const lsa = require('/root/reference/lib/lineSegmentAnalyzer.js');
const input = JSON.parse(fs.readFileSync(process.argv[2], 'utf8'));
lsa.addLineArrayToSet(input.lines);
lsa.createLocalDataset({ name: input.name, zumsteinVector: !!input.zumstein });
const ok = lsa.analyzeDataset();
if (ok) {
  lsa.printDataset({ ignoreWhitespaces: true, printName: input.name });
  lsa.doGrouping();
  lsa.printDataset({ ignoreWhitespaces: true, printName: input.name + 'Grouped' });
}
lsa.deleteSetOfLines();
console.log = origLog;
process.stdout.write(ok ? 'ok' : 'skip');
