// Posts the selected files + enumCardinality to /upload as
// multipart/form-data (the S5 pipeline) and renders the response.
document.getElementById("f").addEventListener("submit", async (ev) => {
  ev.preventDefault();
  const fd = new FormData();
  for (const f of document.getElementById("files").files) fd.append(f.name, f);
  fd.append("enumCardinality", document.getElementById("card").value || "0");
  const res = await fetch("/upload", { method: "POST", body: fd });
  const out = await res.json();
  document.getElementById("schema").textContent =
    JSON.stringify(out.schema || null, null, 2);
  document.getElementById("errors").textContent =
    JSON.stringify({ errors: out.errors || [], warning: out.warning || null }, null, 2);
});
