const fs = require('fs');
const origLog = console.log, origErr = console.error, origWarn = console.warn;
console.log = () => {}; console.error = () => {}; console.warn = () => {};
const CdHtmlParser = require('/root/reference/lib/parser.js');
const parser = new CdHtmlParser();
const input = fs.readFileSync(process.argv[2], 'utf8');
const ret = parser.parse(input);
console.log = origLog; console.error = origErr; console.warn = origWarn;
process.stdout.write(JSON.stringify(ret));
