package graft.gateway

/** Minimal browser UI for the gateway — the server-shipped analog of the
  * reference's static frontend (reference frontend/index.html:79-128,
  * frontend/js/app.js: connection form, editor, run/format/export, results
  * table, stats bar, demo query list). The reference loads CodeMirror from
  * a CDN; this build is offline, so the whole app is ONE self-contained
  * HTML string with zero external assets — every fetch targets the
  * same-origin API routes HttpApi already serves. The editor provides
  * CodeMirror's visible affordance (SQL syntax highlighting) with an
  * inline ~30-line tokenizer: a highlighted <pre> layered under a
  * transparent-text textarea, kept in sync on input and scroll.
  */
object WebUi {

  val html: String =
    """<!DOCTYPE html>
      |<html lang="en">
      |<head>
      |<meta charset="utf-8">
      |<title>Graft — SQL over Iceberg</title>
      |<style>
      |  :root { color-scheme: light dark; }
      |  body { font-family: system-ui, sans-serif; margin: 0; display: flex; min-height: 100vh; }
      |  aside { width: 260px; padding: 16px; border-right: 1px solid #8884; }
      |  main { flex: 1; padding: 16px; display: flex; flex-direction: column; gap: 8px; }
      |  h1 { font-size: 16px; margin: 0 0 12px; }
      |  label { display: block; font-size: 12px; margin-top: 8px; }
      |  input, select, textarea { width: 100%; box-sizing: border-box; font: inherit; }
      |  .editor { position: relative; height: 140px; }
      |  .editor textarea, .editor pre {
      |    position: absolute; inset: 0; margin: 0; padding: 6px; border: 1px solid #8886;
      |    font: 13px/1.45 ui-monospace, monospace; white-space: pre-wrap; word-break: break-word;
      |    overflow: auto; box-sizing: border-box; }
      |  .editor textarea { background: transparent; color: transparent; caret-color: CanvasText; resize: none; }
      |  .editor pre { pointer-events: none; }
      |  .kw { color: #08c; font-weight: 600; } .st { color: #a31; } .nu { color: #164; }
      |  .cm { color: #888; font-style: italic; } .fn { color: #82a; }
      |  button { margin-right: 6px; }
      |  table { border-collapse: collapse; font-size: 13px; }
      |  th, td { border: 1px solid #8884; padding: 3px 8px; text-align: left; }
      |  #stats { font-size: 12px; opacity: .8; }
      |  #error { color: #c00; white-space: pre-wrap; }
      |  #results { overflow: auto; }
      |</style>
      |</head>
      |<body>
      |<aside>
      |  <h1>Connection</h1>
      |  <label>Storage type
      |    <select id="storageType"><option>minio</option><option>s3</option><option>r2</option></select>
      |  </label>
      |  <label>Endpoint <input id="endpoint" value="http://localhost:9000"></label>
      |  <label>Access key <input id="accessKey"></label>
      |  <label>Secret key <input id="secretKey" type="password"></label>
      |  <label>Session token (STS, optional) <input id="sessionToken" type="password"></label>
      |  <label>Region <input id="region" value="us-east-1"></label>
      |  <label>Table path (s3://...) <input id="tablePath"></label>
      |  <p>
      |    <button id="testBtn">Test connection</button>
      |    <button id="demoBtn">Load demo</button>
      |  </p>
      |  <div id="connStatus"></div>
      |  <h1>Recent connections</h1>
      |  <div id="recent"></div>
      |  <h1>Sample queries</h1>
      |  <div id="samples"></div>
      |  <h1>Query history</h1>
      |  <div id="history"></div>
      |</aside>
      |<main>
      |  <div class="editor">
      |    <pre id="hl" aria-hidden="true"></pre>
      |    <textarea id="sql" spellcheck="false">SELECT 1 AS ok</textarea>
      |  </div>
      |  <div>
      |    <button id="runBtn">Run</button>
      |    <button id="formatBtn">Format</button>
      |    <button id="exportBtn">Export CSV</button>
      |    <label style="display:inline">Row limit <input id="rowLimit" value="1000" size="6" style="width:6em"></label>
      |  </div>
      |  <div id="stats"></div>
      |  <div id="error"></div>
      |  <div id="results"></div>
      |</main>
      |<script>
      |"use strict";
      |const $ = id => document.getElementById(id);
      |const KW = new Set(('select from where group by order having limit offset join inner left right ' +
      |  'full cross on as and or not in is null like between case when then else end union all ' +
      |  'intersect except distinct with values exists any asc desc cast over partition rows range ' +
      |  'filter rollup cube grouping sets pivot unpivot qualify using natural semi anti lateral').split(' '));
      |const esc = s => s.replace(/[&<>]/g, c => ({'&':'&amp;','<':'&lt;','>':'&gt;'}[c]));
      |// O(1) lookahead (no src.slice copies — a big paste would otherwise
      |// make every keystroke O(n^2)).
      |function callAhead(s, i) {
      |  while (i < s.length && /\s/.test(s[i])) i++;
      |  return s[i] === '(';
      |}
      |function hl() {
      |  const src = $('sql').value;
      |  const re = /--[^\n]*|\/\*[\s\S]*?(?:\*\/|$)|'(?:[^'\\]|''|\\.)*'?|\b\d+(?:\.\d+)?\b|\b[A-Za-z_][A-Za-z0-9_]*\b/g;
      |  let out = '', last = 0, m;
      |  while ((m = re.exec(src)) !== null) {
      |    out += esc(src.slice(last, m.index));
      |    const t = m[0];
      |    const cls = t.startsWith('--') || t.startsWith('/*') ? 'cm'
      |      : t.startsWith("'") ? 'st'
      |      : /^\d/.test(t) ? 'nu'
      |      : KW.has(t.toLowerCase()) ? 'kw'
      |      : callAhead(src, re.lastIndex) ? 'fn' : '';
      |    out += cls ? '<span class="' + cls + '">' + esc(t) + '</span>' : esc(t);
      |    last = re.lastIndex;
      |  }
      |  // Trailing newline needs a filler so the pre keeps the same height.
      |  $('hl').innerHTML = out + esc(src.slice(last)) + '\n';
      |}
      |function setSql(v) { $('sql').value = v; hl(); }
      |$('sql').addEventListener('input', hl);
      |$('sql').addEventListener('scroll', () => {
      |  $('hl').scrollTop = $('sql').scrollTop; $('hl').scrollLeft = $('sql').scrollLeft;
      |});
      |hl();
      |function conn() {
      |  const c = { storageType: $('storageType').value, endpoint: $('endpoint').value,
      |    accessKey: $('accessKey').value, secretKey: $('secretKey').value,
      |    region: $('region').value };
      |  // Only real object-store paths belong in the connection (ingress
      |  // validation requires s3://); the demo table is addressed directly
      |  // by iceberg_scan('<local path>') in the SQL instead.
      |  const tp = $('tablePath').value;
      |  if (tp && tp.startsWith('s3://')) c.tablePath = tp;
      |  // STS temporary credentials ride along only when present, like the
      |  // reference's optional session-token field.
      |  if ($('sessionToken').value) c.sessionToken = $('sessionToken').value;
      |  return c;
      |}
      |// Query history + recent connections, localStorage-backed like the
      |// reference frontend. Credentials NEVER land in localStorage: recent
      |// connections keep only the addressable parts (type, endpoint,
      |// region, table path) — keys and tokens must be re-entered.
      |// A corrupted stored value must not kill the whole script at
      |// startup — fall back to empty and let the next write repair it.
      |function readStore(key) {
      |  try { const v = JSON.parse(localStorage.getItem(key) || '[]');
      |    return Array.isArray(v) ? v : []; }
      |  catch (e) { return []; }
      |}
      |function listButtons(el, items) {
      |  el.replaceChildren(...items.map(([label, title, fn]) => {
      |    const b = document.createElement('button');
      |    b.textContent = label; b.title = title;
      |    b.style.cssText = 'display:block;margin:2px 0;width:100%;text-align:left;' +
      |      'overflow:hidden;text-overflow:ellipsis;white-space:nowrap';
      |    b.onclick = fn;
      |    return b;
      |  }));
      |}
      |function loadHistory() {
      |  const h = readStore('graftQueryHistory');
      |  listButtons($('history'), h.slice(0, 10).map(item =>
      |    [item.query, new Date(item.timestamp).toLocaleString() + '\n' + item.query,
      |      () => setSql(item.query)]));
      |}
      |function addHistory(q) {
      |  const h = readStore('graftQueryHistory').filter(i => i.query !== q);
      |  h.unshift({ query: q, timestamp: Date.now() });
      |  if (h.length > 20) h.length = 20;
      |  localStorage.setItem('graftQueryHistory', JSON.stringify(h));
      |  loadHistory();
      |}
      |function loadRecent() {
      |  const r = readStore('graftRecentConnections');
      |  listButtons($('recent'), r.map(c =>
      |    [c.storageType.toUpperCase() + ': ' + c.endpoint,
      |      new Date(c.timestamp).toLocaleString(),
      |      () => {
      |        $('storageType').value = c.storageType; $('endpoint').value = c.endpoint;
      |        if (c.region) $('region').value = c.region;
      |        $('tablePath').value = c.tablePath || '';
      |      }]));
      |}
      |function addRecent(c) {
      |  // Dedupe on the full address (type, endpoint, table path) — keying
      |  // on endpoint alone would overwrite a sibling table on the same
      |  // store, so two tables on one MinIO endpoint could never coexist.
      |  const r = readStore('graftRecentConnections').filter(x =>
      |    !(x.storageType === c.storageType && x.endpoint === c.endpoint &&
      |      (x.tablePath || '') === (c.tablePath || '')));
      |  r.unshift({ storageType: c.storageType, endpoint: c.endpoint,
      |    region: c.region, tablePath: c.tablePath || '', timestamp: Date.now() });
      |  if (r.length > 5) r.length = 5;
      |  localStorage.setItem('graftRecentConnections', JSON.stringify(r));
      |  loadRecent();
      |}
      |loadHistory(); loadRecent();
      |async function api(path, body) {
      |  const r = await fetch(path, { method: 'POST',
      |    headers: { 'Content-Type': 'application/json' }, body: JSON.stringify(body) });
      |  const j = await r.json();
      |  if (!r.ok) throw new Error(j.detail || r.statusText);
      |  return j;
      |}
      |function render(res) {
      |  $('stats').textContent = res.stats.rowsReturned + ' rows' + (res.truncated ? ' (truncated)' : '')
      |    + ' · ' + res.stats.executionTimeMs + ' ms · ' + res.stats.bytesScanned + ' bytes scanned';
      |  const t = document.createElement('table');
      |  const hr = t.insertRow();
      |  for (const c of res.columns) { const th = document.createElement('th'); th.textContent = c; hr.appendChild(th); }
      |  for (const row of res.rows) {
      |    const tr = t.insertRow();
      |    for (const v of row) tr.insertCell().textContent = v === null ? 'NULL' : String(v);
      |  }
      |  $('results').replaceChildren(t);
      |}
      |$('runBtn').onclick = async () => {
      |  $('error').textContent = '';
      |  try {
      |    render(await api('/api/query',
      |      { sql: $('sql').value, connection: conn(), rowLimit: +$('rowLimit').value }));
      |    addHistory($('sql').value); addRecent(conn());
      |  } catch (e) { $('error').textContent = e.message; }
      |};
      |$('formatBtn').onclick = async () => {
      |  try { setSql((await api('/api/format', { sql: $('sql').value })).formatted); }
      |  catch (e) { $('error').textContent = e.message; }
      |};
      |$('exportBtn').onclick = async () => {
      |  $('error').textContent = '';
      |  try {
      |    const r = await fetch('/api/query/export', { method: 'POST',
      |      headers: { 'Content-Type': 'application/json' },
      |      body: JSON.stringify({ sql: $('sql').value, connection: conn(), rowLimit: +$('rowLimit').value }) });
      |    if (!r.ok) { $('error').textContent = (await r.json()).detail; return; }
      |    const a = document.createElement('a');
      |    a.href = URL.createObjectURL(await r.blob());
      |    a.download = 'graft-results.csv';
      |    a.click();
      |  } catch (e) { $('error').textContent = e.message; }
      |};
      |$('testBtn').onclick = async () => {
      |  $('connStatus').textContent = '...';
      |  try {
      |    const j = await api('/api/connect/test', { connection: conn() });
      |    $('connStatus').textContent = j.message + (j.tableInfo ? ' — ' + j.tableInfo.path : '');
      |    if (j.tableInfo && j.tableInfo.suggestedQuery) setSql(j.tableInfo.suggestedQuery);
      |    addRecent(conn());
      |  } catch (e) { $('connStatus').textContent = e.message; }
      |};
      |$('demoBtn').onclick = async () => {
      |  try {
      |  const c = await (await fetch('/api/demo/connection')).json();
      |  for (const k of ['storageType', 'endpoint', 'accessKey', 'secretKey', 'region', 'tablePath'])
      |    if (c[k] !== undefined) $(k).value = c[k];
      |  const qs = await (await fetch('/api/demo/queries')).json();
      |  $('samples').replaceChildren(...qs.queries.map(q => {
      |    const b = document.createElement('button');
      |    b.textContent = q.name; b.title = q.description;
      |    b.style.cssText = 'display:block;margin:2px 0;width:100%;text-align:left';
      |    b.onclick = () => { setSql(q.sql); };
      |    return b;
      |  }));
      |  } catch (e) { $('connStatus').textContent = e.message; }
      |};
      |</script>
      |</body>
      |</html>
      |""".stripMargin
}
