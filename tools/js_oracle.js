// Parity oracle: evaluates the REFERENCE implementation (read-only,
// at /root/reference) and executes its scalar functions on inputs
// supplied as JSON on stdin: [{fn: "name", args: [...]}, ...].
// Prints the JSON list of results. Used by tests/test_js_parity.py to
// check the Spark engine against the reference's actual JS behavior
// without copying any reference code into this repo.
//
// The reference is UNTRUSTED content, so it is executed inside a
// bare `vm` context: no require, no fs, no process, no Buffer — just
// the context's own JS intrinsics. Its content hash is pinned below;
// if the file ever changes, this oracle refuses to run it instead of
// silently executing new code.
const fs = require("fs");
const crypto = require("crypto");
const vm = require("vm");

const REF_PATH = "/root/reference/apps-scripts/code-LLM-intergration.js";
const PINNED_SHA256 =
  "24e3735a374bd626667c9db6d72947df5099e25488306f6c270e8ad440d0952e";

const src = fs.readFileSync(REF_PATH, "utf8");
const digest = crypto.createHash("sha256").update(src, "utf8").digest("hex");
if (digest !== PINNED_SHA256) {
  console.error(
    `js_oracle: reference content hash mismatch (got ${digest}); ` +
      "refusing to execute changed reference code"
  );
  process.exit(3);
}

// Bare context: top-level function declarations in the reference
// become properties of `ref`; nothing from this Node process leaks
// in. The only injected global is WHATWG URL (the reference's
// `new URL(u)` — an Apps-Script-provided global there) — a pure
// parser with no I/O capability.
const ref = vm.createContext({ URL });
vm.runInContext(src, ref, { filename: "reference.js", timeout: 10000 });

const FNS = {
  hostFromUrl_: (u) => ref.hostFromUrl_(u),
  makeCanonical_: (u) => ref.makeCanonical_(u),
  niceCase_: (s) => ref.niceCase_(s),
  guessCompanyFromUrl_: (u) => ref.guessCompanyFromUrl_(u),
  cleanRole_: (t, c) => ref.cleanRole_(t, c),
  decodeHtml_: (s) => ref.decodeHtml_(s),
  stripEmojis_: (s) => ref.stripEmojis_(s),
  isGenericTitle_: (s) => ref.isGenericTitle_(s),
  isAtsHost_: (h) => ref.isAtsHost_(h),
  isAggregatorHost_: (h) => ref.isAggregatorHost_(h),
  getMeta_: (h, k, a) => ref.getMeta_(h, k, a),
  getTitle_: (h) => ref.getTitle_(h),
  getH1_: (h) => ref.getH1_(h),
  textPreview_: (h, n) => ref.textPreview_(h, n),
  hasUsefulSignal_: (h) => ref.hasUsefulSignal_(h),
};

const tasks = JSON.parse(fs.readFileSync(0, "utf8"));
const out = tasks.map((t) => FNS[t.fn](...t.args));
process.stdout.write(JSON.stringify(out));
